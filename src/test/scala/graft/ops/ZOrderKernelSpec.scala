package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The raw Morton kernel ([[ZOrderOps.interleave]]) and its generated
  * SQL twin. Layout-level behavior (file skipping, Hilbert comparison,
  * n-D) is covered by `graft.pipeline.ZOrderSpec` against
  * `TableLayout`, whose `zValue` routes through this same kernel.
  */
class ZOrderKernelSpec extends AnyFunSuite {
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

  test("kernel and SQL twin agree across a random grid (property sweep)") {
    val rows = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val viaKernel = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrderOps.interleave(Seq(col("x"), col("y")), 5).as("z"))
      .orderBy("x", "y").collect().map(_.getLong(2))
    rows.toDF("x", "y").createOrReplaceTempView("grid_xy")
    val viaSql = spark.sql(
      s"""SELECT x, y, CAST(${ZOrderOps.interleaveSql(Seq("x", "y"), 5)} AS BIGINT) AS z
         |FROM grid_xy ORDER BY x, y""".stripMargin)
      .collect().map(_.getLong(2))
    assert(viaKernel.toSeq === viaSql.toSeq)
    // and the 1024 codes are a permutation of 0..1023 (bijectivity)
    assert(viaKernel.sorted.toSeq === (0L until 1024L))
  }
}
