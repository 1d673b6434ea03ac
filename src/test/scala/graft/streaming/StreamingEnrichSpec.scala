package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.pipeline.BloomIndex

/** Per-batch key pushdown enrichment: exact parity with the plain join
  * in BOTH regimes, file-level skipping when composed with BloomIndex,
  * and end-to-end through a real AvailableNow stream.
  */
class StreamingEnrichSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val helper = new AdaptiveSparkPlanHelper {}

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    helper.collect(df.queryExecution.executedPlan) { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  // static dim: keys 0..999 clustered so file skipping can pay
  private def writeStatic(root: String): Int = {
    (0L until 1000L).map(k => (k, s"attr_$k")).toDF("key", "attr")
      .repartitionByRange(8, col("key"))
      .sortWithinPartitions("key")
      .write.parquet(root + "/plain")
    BloomIndex.write(
      spark.read.parquet(root + "/plain"), root + "/idx", "key", expectedKeysPerFile = 1000)
    new java.io.File(root + "/idx").listFiles().count(_.getName.endsWith(".parquet"))
  }

  test("IN regime: parity with the plain left join, and the static scan skips files via BloomIndex") {
    val root = graft.TestTmp.dir("enrich1")
    val nFiles = writeStatic(root)
    assert(nFiles >= 4)
    val static = BloomIndex.readIndexed(spark, root + "/idx", "key")
    // a small batch, including an unmatched key and a null
    val batch = Seq(Some(3L), Some(911L), Some(5555L), None)
      .toDF("k").withColumn("payload", coalesce(col("k"), lit(-1L)) * 10)
    val got = StreamingEnrich.enrichBatch(batch, static, "k", "key")
    val want = batch.join(spark.read.parquet(root + "/plain"), col("k") === col("key"), "left")
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
    assert(got.count() == 4, "left join keeps unmatched and null-key rows")
    // the static side of the enriched plan listed fewer files
    val scanned = scannedFiles(StreamingEnrich.enrichBatch(batch, static, "k", "key"))
    assert(scanned < nFiles, s"file skip: $scanned of $nFiles static files")
  }

  test("bloom regime: a wide-key batch still matches the plain join exactly") {
    val root = graft.TestTmp.dir("enrich2")
    writeStatic(root)
    val static = spark.read.parquet(root + "/plain")
    // 600 distinct keys > maxInListKeys=64 forces the bloom path;
    // half the keys miss the static table entirely
    val batch = (0L until 600L).map(i => i * 3).toDF("k")
    val got = StreamingEnrich.enrichBatch(batch, static, "k", "key", maxInListKeys = 64)
    val want = batch.join(static, col("k") === col("key"), "left")
    assert(got.collect().map(_.toString).sorted.toSeq ==
      want.collect().map(_.toString).sorted.toSeq)
  }

  test("empty batch: no static scan output, no crash") {
    val root = graft.TestTmp.dir("enrich3")
    writeStatic(root)
    val static = spark.read.parquet(root + "/plain")
    val batch = Seq.empty[Long].toDF("k")
    assert(StreamingEnrich.enrichBatch(batch, static, "k", "key").count() == 0)
  }

  test("end-to-end AvailableNow: file stream enriched per batch equals the batch join") {
    val root = graft.TestTmp.dir("enrich4")
    writeStatic(root)
    val srcDir = root + "/src"
    val events = Seq((3L, "a"), (911L, "b"), (5555L, "c"), (42L, "d"))
      .toDF("k", "tag")
    events.repartition(2).write.parquet(srcDir)
    StreamingEnrich.runEnrichAvailableNow(
      spark, srcDir, events.schema,
      s => BloomIndex.readIndexed(s, root + "/idx", "key"),
      "k", "key", root + "/out", root + "/ckpt")
    val got = spark.read.parquet(root + "/out")
      .select("k", "tag", "attr").collect().map(_.toString).sorted.toSeq
    val want = events
      .join(spark.read.parquet(root + "/plain"), col("k") === col("key"), "left")
      .select("k", "tag", "attr").collect().map(_.toString).sorted.toSeq
    assert(got == want && got.size == 4)
  }
}
