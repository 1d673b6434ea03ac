package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order clustering: the Morton code is bit-exact, and the layout
  * actually concentrates a box query's rows into fewer files than a
  * single-column sort — the multi-dimension data-skipping win.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zValue interleaves bits exactly (checked against a Scala reference)") {
    val df = Seq((0.0, 0.0), (3.0, 0.0), (0.0, 3.0), (3.0, 3.0), (1.0, 2.0))
      .toDF("x", "y")
    val got = df.select(
      col("x"), col("y"),
      TableLayout.zValue(Seq(col("x"), col("y")), Seq((0.0, 3.0), (0.0, 3.0)), bits = 2)
        .as("z"))
      .collect().map(r => ((r.getDouble(0), r.getDouble(1)), r.getLong(2))).toMap
    def ref(xc: Int, yc: Int): Long = {
      var z = 0L
      for (b <- 0 until 2) {
        z |= ((xc >> b) & 1).toLong << (b * 2)
        z |= ((yc >> b) & 1).toLong << (b * 2 + 1)
      }
      z
    }
    // scale: v/3*3 -> code = v (values 0..3 map to codes 0..3)
    assert(got((0.0, 0.0)) == ref(0, 0))
    assert(got((3.0, 0.0)) == ref(3, 0))
    assert(got((0.0, 3.0)) == ref(0, 3))
    assert(got((3.0, 3.0)) == ref(3, 3))
    assert(got((1.0, 2.0)) == ref(1, 2))
    assert(got((3.0, 3.0)) == 15L, "all four bits set for the max corner")
  }

  test("hilbertIndex walks the grid: consecutive curve positions are always grid-adjacent") {
    val bits = 3 // 8x8 grid
    val cells = for (x <- 0 until 8; y <- 0 until 8)
      yield (graft.functions.HashKernels.hilbertIndex(bits, x, y), (x, y))
    val byD = cells.sortBy(_._1)
    assert(byD.map(_._1) == (0L until 64L), "bijection onto 0..63")
    byD.sliding(2).foreach { case Seq((_, (x1, y1)), (d2, (x2, y2))) =>
      val manhattan = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(manhattan == 1,
        s"curve step to d=$d2 jumps ($x1,$y1)->($x2,$y2) — Hilbert must move one cell")
    }
    // the Morton curve provably lacks this property on the same grid
    // (e.g. d=1 -> d=2 jumps diagonally); sanity-check our claim
    def morton(x: Int, y: Int) =
      (0 until bits).map(b => (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))).sum
    val mByD = (for (x <- 0 until 8; y <- 0 until 8) yield (morton(x, y), (x, y))).sortBy(_._1)
    val mortonJumps = mByD.sliding(2).count { case Seq((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(mortonJumps > 0, "Morton has diagonal jumps — the property Hilbert removes")
  }

  test("hilbert layout concentrates a second-dimension box at least as well as z-order") {
    val root = graft.TestTmp.dir("graft-hilbert")
    val df = (0 until 20000).map { i =>
      (i.toLong, (i % 200).toDouble * 5, (i / 200).toDouble * 10)
    }.toDF("id", "x", "y")
    val nFiles = 16
    TableLayout.zOrderWrite(df, Seq("x", "y"), s"$root/z", nFiles)
    TableLayout.hilbertOrderWrite(df, "x", "y", s"$root/h", nFiles)
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y").between(100, 160))
        .select(input_file_name()).distinct().count()
    val z = filesTouched(s"$root/z")
    val h = filesTouched(s"$root/h")
    // one boundary file of slack: repartitionByRange's sampler is seeded
    // from the RDD id (session-history-dependent), so where exactly the
    // range bounds fall — and whether a box edge straddles one more
    // file — varies by a file across runs of the same data. The
    // CONCENTRATION claim below is the structural property; hilbert
    // losing to z-order by more than a boundary file would be real.
    assert(h <= z + 1, s"hilbert ($h files) must not be worse than z-order ($z files)")
    assert(h <= nFiles / 2, s"hilbert must concentrate the box, got $h of $nFiles")
    assert(spark.read.parquet(s"$root/h").count() == 20000)
  }

  test("z-ordered layout touches fewer files than single-column sort for a second-column box") {
    val root = graft.TestTmp.dir("graft-zorder")
    // 2-D uniform grid: both dimensions GENUINELY independent (a
    // multiplier-mod pair would make y a bijection of x and the
    // comparison vacuous)
    val df = (0 until 20000).map { i =>
      (i.toLong, (i % 200).toDouble * 5, (i / 200).toDouble * 10)
    }.toDF("id", "x", "y")
    val nFiles = 16

    // layout A: classic single-column sort on x
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$root/by_x")
    // layout B: z-order on (x, y)
    TableLayout.zOrderWrite(df, Seq("x", "y"), s"$root/zorder", nFiles)

    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("y").between(100, 160)) // thin box on the SECOND dimension
        .select(input_file_name()).distinct().count()

    val linear = filesTouched(s"$root/by_x")
    val z = filesTouched(s"$root/zorder")
    assert(linear == nFiles,
      s"x-sorted layout spreads y everywhere: expected all $nFiles files, got $linear")
    assert(z <= nFiles / 2,
      s"z-order must concentrate the y-box into few files, got $z of $nFiles")
    // both layouts hold the same rows
    assert(spark.read.parquet(s"$root/zorder").count() == 20000)
  }

  test("n-D Hilbert layout prunes boxes on every clustered dimension (3-D)") {
    val root = graft.TestTmp.dir("graft-hilbnd")
    // 3 genuinely independent dims on a 27k-point lattice
    val df = (0 until 27000).map { i =>
      (i.toLong, (i % 30).toDouble, (i / 30 % 30).toDouble, (i / 900).toDouble)
    }.toDF("id", "x", "y", "z")
    val nFiles = 16
    TableLayout.hilbertOrderWriteNd(df, Seq("x", "y", "z"), s"$root/h3", nFiles, bits = 5)
    df.repartitionByRange(nFiles, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$root/by_x")

    def touched(path: String, c: String): Long =
      spark.read.parquet(path)
        .filter(col(c).between(10, 14)) // thin box on one dimension
        .select(input_file_name()).distinct().count()

    // the x-sorted layout spreads y and z boxes over every file; the
    // 3-D curve concentrates boxes on EACH dimension
    assert(touched(s"$root/by_x", "y") == nFiles)
    assert(touched(s"$root/by_x", "z") == nFiles)
    for (c <- Seq("x", "y", "z")) {
      val t = touched(s"$root/h3", c)
      assert(t < nFiles, s"hilbert-3D must prune a $c-box: got $t of $nFiles")
    }
    assert(spark.read.parquet(s"$root/h3").count() == 27000)
  }
}
