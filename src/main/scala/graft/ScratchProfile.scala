package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Throwaway stage profiler for in-query training pipelines (kept out
  * of the query surface; used to attribute bench cost while tuning).
  */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).count()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rnd <- 1 to 2) {
      println(s"[prof] --- bpe round $rnd ---")
      val docs = t("docs+count") { val x = Tables.documents(spark, d); x.count(); x }
      val merges = t("learnMerges(b3)") {
        BpeTrain.learnMerges(docs, numMerges = 6, minCount = 2, batch = 3) }
      val seg = t("tokenizeDropout+count") {
        val x = BpeTrain.tokenizeDropout(docs, merges, p = 0.2, seed = 1L)
          .select(col("doc_id"), posexplode(col("tokens")).as(Seq("pos", "token")))
        x.count(); x }
      t("rebuild+join+noop") {
        val rebuilt = seg.groupBy("doc_id").agg(
          concat_ws("", sort_array(collect_list(struct(col("pos"), col("token"))))
            .getField("token")).as("joined"),
          count(lit(1)).cast("long").as("n_tokens"))
        val canon = docs.select(col("doc_id"),
          concat_ws(" ", filter(split(col("text"), " "), x => length(x) > 0)).as("ct"))
        canon.join(rebuilt, Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"),
            when(rtrim(regexp_replace(col("joined"), "</w>", " ")) === col("ct"), 1L)
              .otherwise(0L).as("reconstructed"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
