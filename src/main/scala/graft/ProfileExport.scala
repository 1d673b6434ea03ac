package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the pretrain-export flagship stages (round-12
  * headroom work) — times each stage of the composed chain in
  * isolation at sf0.1, bench-shaped (noop sink, warm session). */
object ProfileExport {
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
    graft.SparkEntry.entry(spark).count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    
    val docs = Tables.documents(spark, d)
    time("withQuality+filter")(PretrainExportOps.qualityKept(docs).write.format("noop").mode("overwrite").save())
    val kept = PretrainExportOps.qualityKept(docs)
    time("dedupGroupsMd5")(DedupOps.dedupGroupsMd5(kept).write.format("noop").mode("overwrite").save())
    val canon = kept.join(
      DedupOps.dedupGroupsMd5(kept).filter(col("is_canonical")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    time("curated(e2e)")(canon.write.format("noop").mode("overwrite").save())
    time("bpe train")(PretrainExportOps.pinnedBpe(spark, d))
    val merges = PretrainExportOps.pinnedBpe(spark, d)
    time("bpe render canon")(BpeTrain.tokenizeWordIndexed(canon, merges).write.format("noop").mode("overwrite").save())
    val seg = BpeTrain.tokenizeWordIndexed(canon, merges)
    time("perDocStats")(PretrainExportOps.perDocStats(canon, seg, "</w>").write.format("noop").mode("overwrite").save())
    val perDoc = PretrainExportOps.perDocStats(canon, seg, "</w>")
    time("packAndStripe+summary")(
      PretrainExportOps.shardSummary(
        PretrainExportOps.packAndStripe(perDoc, 256L, 8L, 0L, 0L))
        .write.format("noop").mode("overwrite").save())
    time("FULL q_pretrain_export_bpe")(
      graft.SparkEntry.queries("q_pretrain_export_bpe")(spark, d).write.format("noop").mode("overwrite").save())
    time("FULL q_pretrain_export")(
      graft.SparkEntry.queries("q_pretrain_export")(spark, d).write.format("noop").mode("overwrite").save())
    time("FULL q_curate_corpus")(
      graft.SparkEntry.queries("q_curate_corpus")(spark, d).write.format("noop").mode("overwrite").save())
    time("FULL q_pagerank")(
      graft.SparkEntry.queries("q_pagerank")(spark, d).write.format("noop").mode("overwrite").save())
    time("coOrderEdges full")(GraphOps.coOrderEdges(spark, d).write.format("noop").mode("overwrite").save())
    time("coOrderEdges year")(GraphOps.coOrderEdges(spark, d, yearSlice = true).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
