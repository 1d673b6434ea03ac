package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental-export oracle key (r12):
  * replicates PretrainExport.append's body with per-step timings. */
object ProfileIncr {
  def main(args: Array[String]): Unit = {
    val spark0 = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.SparkEntry.entry(spark0).count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val v = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      v
    }
    import graft.pipeline.{PretrainExport, DedupIndex, TxTable, TokenizerStore}
    val model = time("pinned model")(PretrainExportOps.pinnedTokenizer(spark0, d))
    val spark = spark0.newSession()
    spark0.conf.getAll.foreach { case (k, v) =>
      try spark.conf.set(k, v) catch { case scala.util.control.NonFatal(_) => () }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = Tables.documents(spark, d)
    val root = "/tmp/graft_incr_export/profile3"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    time("initPinned")(PretrainExport.initPinned(spark, root, model))
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    val split = (r.getLong(0) + r.getLong(1)) / 2

    for ((b, tag) <- Seq(
        (docs.filter(col("doc_id") <= split), "b1"),
        (docs.filter(col("doc_id") > split), "b2"))) {
      println(s"--- append $tag ---")
      val p = PretrainExport.Params()
      val m = time("loadModel")(TokenizerStore.loadUnigramAt(spark, s"$root/tokenizer", 1L))
      val docsIn = time("docsIn count")(b.count())
      val kept = time("kept ck")(PretrainExportOps.qualityKept(b).localCheckpoint(true))
      val verdicts = time("dedup ingest")(DedupIndex.ingest(spark, s"$root/dedup", kept, p.dedup))
      val canon = time("canon ck")(kept.join(
        verdicts.filter(col("accepted")).select("doc_id"), Seq("doc_id"), "left_semi")
        .localCheckpoint(true))
      val sRoot = s"$root/shards"
      val hasShards = TxTable.latest(spark, sRoot)._1 > 0
      val (tokenBase, rowBase, maxStored) = time("base agg")(
        if (hasShards) {
          val rr = TxTable.read(spark, sRoot)
            .agg(sum(col("n_tokens")), count(lit(1)), max(col("doc_id"))).collect()(0)
          (rr.getLong(0), rr.getLong(1), Some(rr.getLong(2)))
        } else (0L, 0L, None))
      val novel = time("novel ck")(
        if (hasShards)
          canon.join(TxTable.read(spark, sRoot).select("doc_id"), Seq("doc_id"), "left_anti")
            .localCheckpoint(true)
        else canon)
      time("min guard")(maxStored.foreach { mx =>
        val minNew = novel.agg(min(col("doc_id"))).collect()(0)
        require(minNew.isNullAt(0) || minNew.getLong(0) > mx)
      })
      val seg = UnigramLmOps.tokenize(novel, m, maxLen = p.maxLen)
      val perDoc = PretrainExportOps.perDocStats(novel, seg, "")
      val rows = time("packAndStripe plan+cks")(PretrainExportOps.packAndStripe(
        perDoc, p.windowBudget, p.stripeShards, tokenBase, rowBase))
      val cut = rows.localCheckpoint(false)
      val n = time("rows count")(cut.count())
      time("appendCommit")(if (n > 0) TxTable.appendCommit(spark, sRoot, cut, "shard"))
    }
    time("manifest")(PretrainExport.manifest(spark, root)
      .write.format("noop").mode("overwrite").save())
    spark0.stop()
  }
}
