package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Per-file bloom sidecars: pruning actually skips files on a
  * key-clustered table, results stay exact (false positives filtered),
  * and absent keys read zero files.
  */
class BloomIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeClustered(root: String): Int = {
    // cluster by key so each file holds a narrow key range — the
    // layout that makes file skipping pay (TableLayout's job)
    val df = (0L until 4000L).map(i => (i % 40, i, s"payload$i"))
      .toDF("key", "id", "payload")
      .repartitionByRange(8, col("key"))
    BloomIndex.write(df, root, "key", expectedKeysPerFile = 1000)
    spark.read.parquet(root).inputFiles.length
  }

  test("point lookups read a strict subset of files; results equal a full scan") {
    val root = graft.TestTmp.dir("graft-bloomidx") + "/t"
    val nFiles = writeClustered(root)
    assert(nFiles >= 4, s"need multiple files for a pruning test, got $nFiles")

    val probed = BloomIndex.probeFiles(spark, root, Seq(7L))
    assert(probed.nonEmpty && probed.length < nFiles,
      s"bloom must prune: ${probed.length} of $nFiles files survived")

    val viaIndex = BloomIndex.lookup(spark, root, "key", Seq(7L))
      .select("id").as[Long].collect().sorted.toSeq
    val fullScan = spark.read.parquet(root).filter(col("key") === 7L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaIndex == fullScan && viaIndex.nonEmpty)

    // multi-key probe unions the files; still exact
    val multi = BloomIndex.lookup(spark, root, "key", Seq(3L, 33L))
      .select("id").as[Long].collect().sorted.toSeq
    val multiFull = spark.read.parquet(root).filter(col("key").isin(3L, 33L))
      .select("id").as[Long].collect().sorted.toSeq
    assert(multi == multiFull && multi.nonEmpty)
  }

  test("a data file without a sidecar degrades to scan, never to a crash or wrong skip") {
    val root = graft.TestTmp.dir("graft-bloomidx3") + "/t"
    writeClustered(root)
    // simulate a crash between data write and index build for one file
    val dataFile = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    val sidecar = new java.io.File(s"$root/_bloom/$dataFile.bloom")
    assert(sidecar.exists && sidecar.delete())
    // absent key: every indexed file prunes, the UNINDEXED file is kept
    val probed = BloomIndex.probeFiles(spark, root, Seq(99999L))
    assert(probed.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq(dataFile))
    // results still exact for present keys
    val viaIndex = BloomIndex.lookup(spark, root, "key", Seq(7L))
      .select("id").as[Long].collect().sorted.toSeq
    val fullScan = spark.read.parquet(root).filter(col("key") === 7L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaIndex == fullScan && viaIndex.nonEmpty)
  }

  test("corrupt (truncated) sidecar degrades to scan; partitioned dirs are rejected loudly") {
    val root = graft.TestTmp.dir("graft-bloomidx5") + "/t"
    writeClustered(root)
    val dataFile = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    val sidecar = new java.io.File(s"$root/_bloom/$dataFile.bloom")
    // truncate mid-file: readFrom now throws EOF, which must read as
    // "keep the file", not kill the query
    val bytes = java.nio.file.Files.readAllBytes(sidecar.toPath)
    java.nio.file.Files.write(sidecar.toPath, bytes.take(bytes.length / 2))
    val probed = BloomIndex.probeFiles(spark, root, Seq(99999L))
    assert(probed.map(p => p.substring(p.lastIndexOf('/') + 1)) == Seq(dataFile))
    val viaIndex = BloomIndex.lookup(spark, root, "key", Seq(7L))
      .select("id").as[Long].collect().sorted.toSeq
    val fullScan = spark.read.parquet(root).filter(col("key") === 7L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(viaIndex == fullScan)

    // Hive-partitioned layout: refuse rather than silently read nulls
    val proot = graft.TestTmp.dir("graft-bloomidx6") + "/t"
    (0L until 100L).map(i => (i % 4, i)).toDF("key", "id")
      .write.partitionBy("key").parquet(proot)
    val err = intercept[IllegalArgumentException] {
      BloomIndex.readIndexed(spark, proot, "key")
    }
    assert(err.getMessage.contains("partition columns"))
  }

  test("pushed-down form: a plain filter over readIndexed skips files inside the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    val root = graft.TestTmp.dir("graft-bloomidx4") + "/t"
    val nFiles = writeClustered(root)

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val scans = helper.collect(df.queryExecution.executedPlan) {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
      scans.map(_.metrics("numFiles").value).sum
    }

    val indexed = BloomIndex.readIndexed(spark, root, "key")
    // point predicate: the scan itself lists fewer files
    val pruned = scannedFiles(indexed.filter(col("key") === 7L))
    assert(pruned > 0 && pruned < nFiles, s"scan must skip files: $pruned of $nFiles")
    // IN-list predicate prunes too
    val prunedIn = scannedFiles(indexed.filter(col("key").isin(3L, 33L)))
    assert(prunedIn > 0 && prunedIn < nFiles)
    // a non-key predicate reads everything (no false skipping)
    assert(scannedFiles(indexed.filter(col("id") > 100L)) == nFiles)
    // and results are identical to the plain reader
    val a = indexed.filter(col("key") === 7L).select("id").as[Long].collect().sorted.toSeq
    val b = spark.read.parquet(root).filter(col("key") === 7L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("absent keys: no file survives the sidecar pass; lookup returns empty with schema") {
    val root = graft.TestTmp.dir("graft-bloomidx2") + "/t"
    writeClustered(root)
    // 1% fpp over ≤8 files: a miss on every sidecar is the overwhelming
    // outcome; assert pruning strictly beats the full file list
    val probed = BloomIndex.probeFiles(spark, root, Seq(99999L))
    assert(probed.isEmpty, s"absent key should prune everything, got $probed")
    val out = BloomIndex.lookup(spark, root, "key", Seq(99999L))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("key", "id", "payload"))
  }
}
