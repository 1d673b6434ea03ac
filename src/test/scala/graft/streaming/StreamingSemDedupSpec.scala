package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.StreamingSemDedup.SemVerdict

/** Streaming semantic-dedup gate: verdicts must match an independent
  * sequential reference of the gate semantics (first-come-first-kept,
  * compare against accepted only, min-id match), survive a
  * checkpointed restart bit-for-bit, keep chain middles out without
  * dragging chain ends in, and respect the per-cell state cap.
  */
class StreamingSemDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8
  // two axis cells — assignment is argmax cosine over unit centroids
  private val cents: Array[Array[Double]] = Array(
    Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0),
    Array.tabulate(dim)(i => if (i == 1) 1.0 else 0.0))

  private def vec(x: Double, y: Double): Seq[Double] =
    Seq.tabulate(dim)(i => if (i == 0) x else if (i == 1) y else 0.0)
  private def deg(d: Double): Seq[Double] =
    vec(math.cos(math.toRadians(d)), math.sin(math.toRadians(d)))

  /** Sequential reference of the gate: ids ascending, unit-normalize,
    * assign argmax-cosine cell, match = smallest ACCEPTED id in the
    * cell with cosine >= t, store only accepted vectors up to the cap.
    */
  private def reference(
      vecs: Seq[(Long, Seq[Double])], t: Double, maxCell: Int): Map[Long, Option[Long]] = {
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val store = scala.collection.mutable.Map.empty[Int, Vector[(Long, Seq[Double])]]
    val out = scala.collection.mutable.Map.empty[Long, Option[Long]]
    vecs.sortBy(_._1).foreach { case (id, e) =>
      val n = math.sqrt(dot(e, e))
      if (n > 0) {
        val u = e.map(_ / n)
        val cell = cents.indices.maxBy(c => (dot(u, cents(c).toSeq), -c))
        val accepted = store.getOrElse(cell, Vector.empty)
        val m = accepted.filter { case (_, su) => dot(u, su) >= t }.map(_._1).sorted.headOption
        out(id) = m
        if (m.isEmpty && accepted.length < maxCell)
          store(cell) = accepted :+ (id, u)
      }
    }
    out.toMap
  }

  private def drain(root: String, threshold: Double, maxCell: Int): Map[Long, SemVerdict] = {
    val schema = Seq((0L, Seq(0.0))).toDF("vec_id", "embedding").schema
    val stream = spark.readStream.schema(schema).parquet(s"$root/in")
    val q = StreamingSemDedup.semanticVerdicts(stream, cents, threshold, maxCell)
      .writeStream
      .outputMode("append").format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(s"$root/out").as[SemVerdict].collect().map(v => v.vec_id -> v).toMap
  }

  // 15°-apart chain in cell 0: a~b and b~c at cos 15° ≈ 0.966 ≥ 0.95,
  // a~c at cos 30° ≈ 0.866 < 0.95 — plus a distinct cell-0 resident
  // and a near-dup pair in cell 1
  private val batch1 = Seq(
    (1L, deg(0)),          // kept — cell 0 root
    (2L, deg(15)),         // dup of 1
    (3L, deg(30)),         // KEPT: 2 was not stored, and 1 is below t
    (4L, vec(0.2, 1.0)),   // kept — cell 1 root
    (5L, vec(0.21, 1.0)))  // dup of 4
  private val batch2 = Seq(
    (10L, deg(1)),         // cross-batch dup of 1
    (11L, deg(29)),        // cross-batch dup of 3 (not of 1)
    (12L, vec(1.0, -0.9))) // kept — cell 0, far from both residents

  test("verdicts match the sequential reference, within and across batches") {
    val root = graft.TestTmp.dir("graft-semgate")
    batch1.toDF("vec_id", "embedding").write.mode("append").parquet(s"$root/in")
    val v1 = drain(root, 0.95, 1024)
    val ref1 = reference(batch1, 0.95, 1024)
    assert(v1.view.mapValues(_.dup_of).toMap == ref1)
    assert(v1(2L).dup_of.contains(1L) && v1(3L).dup_of.isEmpty,
      s"chain: middle dropped, end kept — ${v1(2L)}, ${v1(3L)}")
    assert(v1(5L).dup_of.contains(4L))

    batch2.toDF("vec_id", "embedding").write.mode("append").parquet(s"$root/in")
    val v2 = drain(root, 0.95, 1024)
    val ref2 = reference(batch1 ++ batch2, 0.95, 1024)
    assert((v1 ++ v2).view.mapValues(_.dup_of).toMap == ref2,
      "cross-batch state must extend the accepted set, not restart it")
    assert(v2(10L).dup_of.contains(1L) && v2(11L).dup_of.contains(3L) && v2(12L).dup_of.isEmpty)
  }

  test("checkpointed two-batch run equals the one-shot run verdict-for-verdict") {
    val split = graft.TestTmp.dir("graft-semgate-split")
    batch1.toDF("vec_id", "embedding").write.mode("append").parquet(s"$split/in")
    val a = drain(split, 0.95, 1024)
    batch2.toDF("vec_id", "embedding").write.mode("append").parquet(s"$split/in")
    val b = drain(split, 0.95, 1024)

    val oneShot = graft.TestTmp.dir("graft-semgate-one")
    (batch1 ++ batch2).toDF("vec_id", "embedding").write.mode("append").parquet(s"$oneShot/in")
    val o = drain(oneShot, 0.95, 1024)
    assert((a ++ b) == o, "restart from checkpoint must be invisible in the verdicts")
  }

  test("cell cap: a full cell still matches its stored vectors but admits no new ones") {
    val root = graft.TestTmp.dir("graft-semgate-cap")
    val data = Seq(
      (1L, deg(0)),   // stored — fills the 1-slot cell
      (2L, deg(30)),  // kept verdict, NOT stored (cap)
      (3L, deg(29)),  // near 2 only — must be KEPT (2 absent from state)
      (4L, deg(1)))   // near 1 — must still be caught by the stored vector
    data.toDF("vec_id", "embedding").write.mode("append").parquet(s"$root/in")
    val v = drain(root, 0.95, 1)
    assert(v(2L).dup_of.isEmpty && v(3L).dup_of.isEmpty && v(4L).dup_of.contains(1L))
    assert(v.view.mapValues(_.dup_of).toMap == reference(data, 0.95, 1))
  }
}
