package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The custom-plan tier end-to-end: logical node → strategy → physical
  * sort-merge as-of. Cross-checked against the union+window
  * formulation (`q_asof_join`) on the driver data; edge semantics
  * (null keys/times, empty right, candidate carry across keys, ties)
  * on handcrafted frames.
  */
class AsOfJoinPlanSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("native as-of equals the union+window formulation on driver events") {
    val native = graft.SparkEntry.queries("q_asof_native")(spark, sf).collect().toSeq
    val window = graft.SparkEntry.queries("q_asof_join")(spark, sf).collect().toSeq
    assert(native.nonEmpty, "flagship data must produce rows")
    assert(native == window)
  }

  test("plan contains AsOfJoinExec with one exchange on the purchase side") {
    val df = graft.SparkEntry.queries("q_asof_native")(spark, sf)
    val plan = df.queryExecution.executedPlan
    def all(p: SparkPlan): Seq[SparkPlan] = collect(p) { case n => n }
    val nodes = all(plan)
    assert(nodes.exists(_.isInstanceOf[AsOfJoinExec]), s"no AsOfJoinExec in:\n$plan")
    // purchases side: 1 exchange; views side: agg on (user,ts) + re-cluster
    // on user = 2; final orderBy adds a range exchange
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(shuffles <= 4, s"expected <=4 exchanges, got $shuffles:\n$plan")
  }

  test("latest-at-or-before semantics, candidate carry across keys, unmatched rows") {
    val right = Seq(
      ("a", ts("2024-01-01 00:00:01"), "r1"),
      ("a", ts("2024-01-01 00:00:05"), "r2"),
      ("b", ts("2024-01-01 00:00:02"), "r3"))
      .toDF("k2", "rt", "rv")
    val left = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L), // before any right row -> null
      ("a", ts("2024-01-01 00:00:05"), 2L), // equal time matches -> r2
      ("a", ts("2024-01-01 00:00:09"), 3L), // after all -> r2
      ("b", ts("2024-01-01 00:00:01"), 4L), // before b's first -> null (not r2!)
      ("c", ts("2024-01-01 00:00:09"), 5L)) // key with no right rows -> null
      .toDF("k", "lt", "id")
    val joined = AsOfOps.asofJoin(left, right, Seq("k"), Seq("k2"), "lt", "rt")
    val out = joined.select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some("r2"), 3L -> Some("r2"), 4L -> None, 5L -> None))
    assert(joined.columns.length == left.columns.length + right.columns.length)
  }

  test("null keys and null times never match; empty right side emits all-null right") {
    val right = Seq(
      (Option("a"), Option(ts("2024-01-01 00:00:01")), "r1"),
      (Option("a"), Option.empty[Timestamp], "rNullT"),
      (Option.empty[String], Option(ts("2024-01-01 00:00:01")), "rNullK"))
      .toDF("k2", "rt", "rv")
    val left = Seq(
      (Option("a"), Option(ts("2024-01-01 00:00:02")), 1L),
      (Option("a"), Option.empty[Timestamp], 2L),      // null left time
      (Option.empty[String], Option(ts("2024-01-01 00:00:02")), 3L)) // null left key
      .toDF("k", "lt", "id")
    val out = AsOfOps.asofJoin(left, right, Seq("k"), Seq("k2"), "lt", "rt")
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("r1"), 2L -> None, 3L -> None))

    val empty = right.filter(lit(false))
    val out2 = AsOfOps.asofJoin(left, empty, Seq("k"), Seq("k2"), "lt", "rt")
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(out2 == Map(1L -> None, 2L -> None, 3L -> None))
  }

  test("multi-key join and colliding-name rejection") {
    val right = Seq(("a", 1, ts("2024-01-01 00:00:01"), "r1")).toDF("k2", "g2", "rt", "rv")
    val left = Seq(
      ("a", 1, ts("2024-01-01 00:00:02"), 10L),
      ("a", 2, ts("2024-01-01 00:00:02"), 11L)).toDF("k", "g", "lt", "id")
    val out = AsOfOps.asofJoin(left, right, Seq("k", "g"), Seq("k2", "g2"), "lt", "rt")
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(out == Map(10L -> Some("r1"), 11L -> None))

    val bad = intercept[IllegalArgumentException] {
      AsOfOps.asofJoin(left, left, Seq("k"), Seq("k"), "lt", "lt")
    }
    assert(bad.getMessage.contains("collide"))
  }

  test("unmatched rows emit NULL for NON-NULLABLE right columns (projection nullability)") {
    // primitive-typed tuples => nullable=false schema on the right side;
    // the null-padded row must still surface as NULL, not 0/false
    val right = Seq(("a", ts("2024-01-01 00:00:05"), 7L, true)).toDF("k2", "rt", "rv", "rb")
    assert(!right.schema("rv").nullable && !right.schema("rb").nullable)
    val left = Seq(
      ("a", ts("2024-01-01 00:00:09"), 1L), // matches -> 7, true
      ("a", ts("2024-01-01 00:00:01"), 2L), // before -> NULL, NULL
      ("z", ts("2024-01-01 00:00:09"), 3L)) // no key -> NULL, NULL
      .toDF("k", "lt", "id")
    val rows = AsOfOps.asofJoin(left, right, Seq("k"), Seq("k2"), "lt", "rt")
      .select("id", "rv", "rb").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows == Map(1L -> Some(7L), 2L -> None, 3L -> None))
  }

  test("column resolution follows spark.sql.caseSensitive (default: insensitive)") {
    val right = Seq(("a", ts("2024-01-01 00:00:01"), "r1")).toDF("k2", "rt", "rv")
    val left = Seq(("a", ts("2024-01-01 00:00:02"), 1L)).toDF("k", "lt", "id")
    val out = AsOfOps.asofJoin(left, right, Seq("K"), Seq("K2"), "LT", "RT")
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("r1")))
  }

  test("tolerance: matches beyond the gap emit the null right side") {
    val right = Seq(
      ("a", ts("2024-01-01 00:00:00"), "r1"),
      ("a", ts("2024-01-01 00:01:00"), "r2")).toDF("k2", "rt", "rv")
    val left = Seq(
      ("a", ts("2024-01-01 00:01:05"), 1L), // 5s after r2 -> within 10s
      ("a", ts("2024-01-01 00:00:30"), 2L), // 30s after r1 -> beyond 10s
      ("a", ts("2024-01-01 00:01:10"), 3L)) // exactly 10s after r2 -> inclusive
      .toDF("k", "lt", "id")
    val out = AsOfOps.asofJoin(left, right, Seq("k"), Seq("k2"), "lt", "rt",
      tolerance = Some(10L * 1000000))
      .select("id", "rv").as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("r2"), 2L -> None, 3L -> Some("r2")))
    // oracle twin runs the post-null formulation over driver data
    val viaQuery = graft.SparkEntry.queries("q_asof_tolerance")(spark, sf)
    val loose = graft.SparkEntry.queries("q_asof_native")(spark, sf)
    val tMatched = viaQuery.filter(col("last_view_id").isNotNull).count()
    val lMatched = loose.filter(col("last_view_id").isNotNull).count()
    assert(viaQuery.count() == loose.count())
    assert(tMatched < lMatched, "the tolerance must actually null out distant matches")
    assert(tMatched > 0, "and keep the close ones")
  }

  test("self-join from one scan (fresh right exprIds) is well-formed") {
    val base = Seq(
      ("a", ts("2024-01-01 00:00:01"), 1L),
      ("a", ts("2024-01-01 00:00:03"), 2L)).toDF("k", "t", "id")
    val renamed = base.toDF("k2", "t2", "id2")
    val out = AsOfOps.asofJoin(base, renamed, Seq("k"), Seq("k2"), "t", "t2")
      .select("id", "id2").as[(Long, Option[Long])].collect().toMap
    // each row matches itself (equal time counts)
    assert(out == Map(1L -> Some(1L), 2L -> Some(2L)))
  }
}
