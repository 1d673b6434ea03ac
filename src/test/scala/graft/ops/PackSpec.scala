package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distributed exclusive prefix sum + sequence packing: parity with a
  * driver-side scan, invariance to the input's incoming partitioning,
  * and the window arithmetic contract.
  */
class PackSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  test("exclusive prefix sum matches a driver-side scan, any input partitioning") {
    val vals = (1L to 97L).map(i => (i, i % 13 + 1))
    val expected = vals.scanLeft((0L, 0L)) { case ((_, acc), (i, v)) => (i, acc + v) }
      .sliding(2).map { case Seq((_, acc), (i, _)) => i -> acc }.toMap
    for (parts <- Seq(1, 3, 8)) {
      val df = spark.createDataset(vals).toDF("id", "v").repartition(parts, col("v"))
      val got = PackOps.exclusivePrefixSum(df, "id", "v", "acc")
        .select("id", "acc").as[(Long, Long)].collect().toMap
      assert(got == expected, s"mismatch at input partitions=$parts")
    }
  }

  test("column-name collisions with helper columns are avoided") {
    val df = Seq((1L, 2L, 9), (2L, 3L, 9)).toDF("id", "v", "pid")
    val out = PackOps.exclusivePrefixSum(df, "id", "v", "acc")
    assert(out.columns.sorted.toSeq == Seq("acc", "id", "pid", "v"))
    assert(out.select("id", "acc").as[(Long, Long)].collect().toMap == Map(1L -> 0L, 2L -> 2L))
  }

  test("q_seq_pack: window arithmetic and monotonicity over the corpus") {
    val rows = graft.SparkEntry.queries("q_seq_pack")(spark, sf)
      .select("doc_id", "n_tokens", "start_off", "window_id", "off_in_window")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    var expectedOff = 0L
    rows.foreach { case (id, n, off, w, inW) =>
      assert(off == expectedOff, s"doc $id start_off $off != running sum $expectedOff")
      assert(w == off / 256 && inW == off % 256, s"doc $id window arithmetic")
      expectedOff += n
    }
  }
}
