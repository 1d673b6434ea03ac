package graft.ops

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order clustering ([[ZOrderOps]]): the kernel is exact, the write
  * preserves data, and — the point of the feature — a 2-D box predicate
  * prunes clustered files by parquet min/max footer statistics where a
  * 1-D linear sort cannot. The skip counting happens at the footer
  * level (the same stats every reader, including Spark's vectorized
  * scan and DuckDB, prunes with), so the measured ratio is
  * engine-independent.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("interleave places bit i of column j at position i*ncols+j") {
    // x=0b101 (5), y=0b011 (3), 3 bits -> z bits (LSB first):
    // x0=1->b0, y0=1->b1, x1=0->b2, y1=1->b3, x2=1->b4, y2=0->b5
    // = 0b011011 = 27
    val row = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrderOps.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .head()
    assert(row.getLong(0) === 27L)
    // SQL twin produces the identical value for the identical input
    val viaSql = spark.sql(
      s"SELECT CAST(${ZOrderOps.interleaveSql(Seq("5", "3"), 3)} AS BIGINT) AS z")
      .head().getLong(0)
    assert(viaSql === 27L)
  }

  private def footerRanges(
      dir: String, cols: Seq[String]): Seq[Map[String, (Long, Long)]] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    files.toSeq.flatMap { f =>
      val in = HadoopInputFile.fromPath(
        new Path(f), spark.sparkContext.hadoopConfiguration)
      val r = ParquetFileReader.open(in, ParquetReadOptions.builder().build())
      val perGroup = r.getRowGroups.asScala.toSeq.map { b =>
        cols.map { c =>
          val cm = b.getColumns.asScala.find(_.getPath.toDotString == c).get
          val st = cm.getStatistics
          c -> (st.genericGetMin.asInstanceOf[Number].longValue(),
            st.genericGetMax.asInstanceOf[Number].longValue())
        }.toMap
      }
      r.close()
      perGroup
    }
  }

  private def overlapping(
      ranges: Seq[Map[String, (Long, Long)]],
      box: Map[String, (Long, Long)]): Int =
    ranges.count(rg => box.forall { case (c, (lo, hi)) =>
      val (mn, mx) = rg(c); mx >= lo && mn <= hi
    })

  test("2-D box predicates prune z-ordered files that a linear sort must read") {
    val root = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val n = 200000L
    // two independent uniform dimensions (hash-derived, deterministic)
    val df = spark.range(n).select(
      pmod(hash(col("id")), lit(1024)).cast("long").as("a"),
      pmod(hash(col("id") * 7 + 13), lit(1024)).cast("long").as("b"))

    val linDir = s"$root/linear"
    val zDir = s"$root/zorder"
    df.repartitionByRange(64, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(linDir)
    ZOrderOps.clusterWrite(df, zDir, Seq("a", "b"), bits = 10, numFiles = 64)

    // clustering preserves the data exactly
    val back = spark.read.parquet(zDir)
    assert(back.count() === n)
    assert(back.agg(sum(col("a") * 1024 + col("b"))).head().getLong(0) ===
      df.agg(sum(col("a") * 1024 + col("b"))).head().getLong(0))

    val cols = Seq("a", "b")
    val lin = footerRanges(linDir, cols)
    val zor = footerRanges(zDir, cols)
    assert(lin.size >= 60 && zor.size >= 60,
      s"expected ~64 row groups per layout, got lin=${lin.size} z=${zor.size}")

    // a 1/8 x 1/8 box: the linear layout prunes on `a` but every
    // surviving file spans all of `b`; the z-order layout bounds both
    val box = Map("a" -> (256L, 383L), "b" -> (512L, 639L))
    val linHit = overlapping(lin, box)
    val zHit = overlapping(zor, box)
    assert(zHit < linHit,
      s"z-order should touch fewer files: z=$zHit linear=$linHit")
    assert(zHit <= lin.size / 4,
      s"z-order should prune most files for a 1/64-area box: z=$zHit of ${zor.size}")

    // and on the SECONDARY dimension alone (where linear sort is
    // helpless by construction: every file spans all of b), z-order
    // still prunes
    val bOnly = Map("b" -> (0L, 127L))
    val linB = overlapping(lin, bOnly)
    val zB = overlapping(zor, bOnly)
    assert(linB >= lin.size - 2, s"linear layout cannot prune on b ($linB/${lin.size})")
    assert(zB <= zor.size / 2, s"z-order should halve b-only scans: $zB/${zor.size}")
  }
}
