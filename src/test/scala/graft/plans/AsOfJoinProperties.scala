package graft.plans

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Differential testing of AsOfJoinExec: random tables (small key
  * space to force collisions, duplicate timestamps, null keys and
  * times, random tolerance) against a driver-side reference
  * implementation of the exact same contract. The example-based spec
  * pins the designed cases; this sweeps the space between them.
  */
class AsOfJoinProperties extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private case class L(k: Option[String], t: Option[Timestamp], id: Long)
  private case class R(k: Option[String], t: Option[Timestamp], v: Long)

  private val keyGen = Gen.option(Gen.oneOf("a", "b", "c"))
  private def tsGen: Gen[Option[Timestamp]] =
    Gen.option(Gen.chooseNum(0L, 50L).map(s => Timestamp.valueOf(s"2024-01-01 00:00:$s%02d".format(s))))

  private def tableGen(maxRows: Int): Gen[(List[(Option[String], Option[Long])], Option[Long])] =
    for {
      n <- Gen.chooseNum(0, maxRows)
      rows <- Gen.listOfN(n, Gen.zip(keyGen, Gen.option(Gen.chooseNum(0L, 50L))))
      tol <- Gen.option(Gen.chooseNum(0L, 20L))
    } yield (rows, tol)

  /** Reference semantics: latest right row with equal key and
    * rightTime <= leftTime (within tolerance); null keys/times never
    * match. Right-side ties on (key, time) must not exist (the
    * operator's determinism contract) — the generator dedupes.
    */
  private def reference(
      left: Seq[L], right: Seq[R], tolSec: Option[Long]): Map[Long, Option[Long]] =
    left.map { l =>
      val m = (l.k, l.t) match {
        case (Some(k), Some(t)) =>
          right
            .filter(r => r.k.contains(k) && r.t.exists(!_.after(t)))
            .filter(r => tolSec.forall(s => t.getTime - r.t.get.getTime <= s * 1000))
            .sortBy(r => -r.t.get.getTime)
            .headOption.map(_.v)
        case _ => None
      }
      l.id -> m
    }.toMap

  test("property: AsOfJoinExec equals the reference on 25 random table pairs") {
    val gen = Gen.zip(tableGen(25), tableGen(15))
    var executed = 0
    (0 until 25).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong * 7919)).foreach {
        case ((lRows, _), (rRowsRaw, tol)) =>
          executed += 1
          def ts(s: Long) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
          val left = lRows.zipWithIndex.map { case ((k, t), idx) =>
            L(k, t.map(ts), idx.toLong)
          }
          // dedupe right (key, time) pairs — operator contract
          val rRows = rRowsRaw.distinctBy(r => (r._1, r._2)).zipWithIndex
          val right = rRows.map { case ((k, t), idx) => R(k, t.map(ts), 1000L + idx) }
          val lDf = left.map(l => (l.k, l.t, l.id)).toDF("k", "t", "id")
          val rDf = right.map(r => (r.k, r.t, r.v)).toDF("k2", "t2", "v")
          val got = AsOfOps.asofJoin(lDf, rDf, Seq("k"), Seq("k2"), "t", "t2",
            tolerance = tol.map(_ * 1000000L))
            .select("id", "v").as[(Long, Option[Long])].collect().toMap
          val want = reference(left, right, tol)
          assert(got == want,
            s"case #$i (tol=$tol)\nleft=$left\nright=$right\ngot =$got\nwant=$want")
      }
    }
    assert(executed >= 20, s"only $executed/25 cases generated")
  }
}
