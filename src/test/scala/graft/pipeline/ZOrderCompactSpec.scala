package graft.pipeline

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[TxTable.compactZOrder]] — the OPTIMIZE ZORDER BY analog: the
  * rewrite preserves data and transactional history, collapses append
  * fragmentation, and leaves per-file footer stats on the zorder
  * columns tight enough that a box predicate prunes most files, where
  * the append-accreted layout pruned none.
  */
class ZOrderCompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkBatch(seed: Int, rows: Int) =
    spark.range(rows.toLong).select(
      (col("id") % 4).cast("string").as("day"),
      pmod(hash(col("id") + seed * 1000003), lit(1024)).cast("long").as("user_bin"),
      pmod(hash(col("id") * 31 + seed), lit(1024)).cast("long").as("val_bin"))

  private def liveParquetFiles(root: String): Seq[String] = {
    val (_, entries) = TxTable.latest(spark, root)
    entries.values.flatMap(_.split("\t")).toSeq.distinct.flatMap { rel =>
      val dir = new java.io.File(s"$root/$rel")
      Option(dir.listFiles()).toSeq.flatten
        .filter(f => f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
    }
  }

  private def ranges(files: Seq[String], cols: Seq[String]) = files.map { f =>
    val in = HadoopInputFile.fromPath(
      new Path(f), spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in, ParquetReadOptions.builder().build())
    val out = cols.map { c =>
      val mins = r.getRowGroups.asScala.map(
        _.getColumns.asScala.find(_.getPath.toDotString == c).get
          .getStatistics.genericGetMin.asInstanceOf[Number].longValue())
      val maxs = r.getRowGroups.asScala.map(
        _.getColumns.asScala.find(_.getPath.toDotString == c).get
          .getStatistics.genericGetMax.asInstanceOf[Number].longValue())
      c -> (mins.min, maxs.max)
    }.toMap
    r.close()
    out
  }

  private def overlapping(rs: Seq[Map[String, (Long, Long)]],
      box: Map[String, (Long, Long)]): Int =
    rs.count(rg => box.forall { case (c, (lo, hi)) =>
      val (mn, mx) = rg(c); mx >= lo && mn <= hi
    })

  test("compactZOrder preserves data + history and makes box predicates prunable") {
    val root = graft.TestTmp.dir("zcompact") + "/t"
    // five appends -> five version dirs, each file spanning the whole
    // (user_bin, val_bin) domain
    (1 to 5).foreach(i => TxTable.appendCommit(spark, root, mkBatch(i, 20000), "day"))
    val before = TxTable.read(spark, root)
    val beforeCount = before.count()
    val beforeSum = before.agg(sum(col("user_bin") * 2048 + col("val_bin")))
      .head().getLong(0)
    val (vBefore, _) = TxTable.latest(spark, root)
    val filesBefore = liveParquetFiles(root)
    assert(filesBefore.size >= 5, s"appends should fragment: ${filesBefore.size}")

    val box = Map("user_bin" -> (256L, 383L), "val_bin" -> (512L, 639L))
    val hitsBefore = overlapping(ranges(filesBefore, Seq("user_bin", "val_bin")), box)
    assert(hitsBefore === filesBefore.size,
      "append-accreted files all span the whole domain — nothing prunes")

    TxTable.compactZOrder(spark, root, "day",
      Seq("user_bin", "val_bin"), bits = 10, numFiles = 32)

    // data identical, history advanced, pre-compaction version travelable
    val after = TxTable.read(spark, root)
    assert(after.count() === beforeCount)
    assert(after.agg(sum(col("user_bin") * 2048 + col("val_bin")))
      .head().getLong(0) === beforeSum)
    val (vAfter, _) = TxTable.latest(spark, root)
    assert(vAfter === vBefore + 1)
    assert(TxTable.readAt(spark, root, vBefore).count() === beforeCount)

    // fragmentation collapsed to one version dir's files, and the same
    // box now prunes most of them
    val filesAfter = liveParquetFiles(root)
    val hitsAfter = overlapping(ranges(filesAfter, Seq("user_bin", "val_bin")), box)
    assert(hitsAfter < filesAfter.size / 2,
      s"z-compacted layout should prune most files: $hitsAfter of ${filesAfter.size}")

    // vacuum reclaims the superseded dirs and the table still reads
    TxTable.vacuum(spark, root)
    assert(TxTable.read(spark, root).count() === beforeCount)
  }
}
