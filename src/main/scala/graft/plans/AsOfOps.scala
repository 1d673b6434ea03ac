package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DatasetBridge

import graft.ops.{QueryDef, Tables}

/** User API over the custom [[AsOfJoin]] plan node, plus its oracle
  * query. `q_asof_native` answers the same question as `q_asof_join`
  * ([[graft.ops.AdvancedOps]]) — latest view at or before each
  * purchase — so DuckDB's native ASOF JOIN checks the custom physical
  * operator end-to-end, and the two independent Spark formulations
  * (union+window vs custom sort-merge) check each other in
  * AsOfJoinPlanSpec.
  */
object AsOfOps {

  /** Left-outer as-of join: for each left row, the right row with equal
    * keys and the greatest `rightTime <= leftTime`. Key lists are
    * positional pairs; time columns must have identical types on both
    * sides (ordering is compared cross-side). Right-side column names
    * must not collide with left-side ones (rename before joining —
    * both schemas survive into the output). `tolerance` (optional)
    * bounds the match gap in the time type's raw units (µs for
    * timestamps, days for dates): a latest-at-or-before row further
    * back than that emits the null right side instead.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    // the session's resolver, so case sensitivity follows
    // spark.sql.caseSensitive like every built-in lookup
    val resolver = left.sparkSession.sessionState.conf.resolver
    val dup = left.columns.filter(l => right.columns.exists(r => resolver(l, r)))
    require(dup.isEmpty, s"column names collide across sides: ${dup.mkString(", ")} — rename first")

    val lp = left.queryExecution.analyzed
    // Fresh exprIds on the right output so a self-join (both sides from
    // one scan) can't alias the same attributes on both sides.
    val rAliases = right.queryExecution.analyzed.output.map(a => Alias(a, a.name)())
    val rp: LogicalPlan = Project(rAliases, right.queryExecution.analyzed)

    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"$side column '$name' not in [${plan.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"$side column '$name' is ambiguous: ${many.map(_.name).mkString(", ")}")
      }

    val lk = leftKeys.map(resolve(lp, _, "left"))
    val rk = rightKeys.map(resolve(rp, _, "right"))
    val lt = resolve(lp, leftTime, "left")
    val rt = resolve(rp, rightTime, "right")
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType, s"key type mismatch: ${a.name}:${a.dataType} vs ${b.name}:${b.dataType}")
    }
    require(lt.dataType == rt.dataType, s"time type mismatch: ${lt.dataType} vs ${rt.dataType}")

    val spark = left.sparkSession
    // GraftExtensions injects the strategy at builder time; cover bare
    // sessions through the experimental-methods hook.
    if (!spark.sessionState.planner.strategies.contains(GraftStrategy) &&
        !spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ GraftStrategy
    }
    DatasetBridge.ofRows(spark, AsOfJoin(lp, rp, lk, rk, lt, rt, tolerance))
  }

  private val IsoMs = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  val all: Seq[QueryDef] = Seq(

    // Custom-plan-node twin of q_asof_join: latest view by the same
    // user at or before each purchase, via AsOfJoinExec.
    QueryDef(
      "q_asof_native",
      """WITH v AS (
        |  SELECT user_id, ts::TIMESTAMP AS vts, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts::TIMESTAMP),
        |p AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS pts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.pts, '%Y-%m-%dT%H:%M:%S.%gZ') AS purchase_time,
        |  v.view_id AS last_view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.pts >= v.vts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      // same deterministic right-side dedup contract as q_asof_join
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_id"))
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("view_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      asofJoin(purchases, views, Seq("user_id"), Seq("v_user"), "ts", "v_ts")
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), IsoMs).as("purchase_time"),
          col("view_id").as("last_view_id"))
        .orderBy("event_id")
    },

    // Tolerance variant: a view only attributes to a purchase within
    // 10 minutes. DuckDB has no ASOF tolerance — the oracle post-nulls
    // matches beyond the gap, which is semantically identical (the
    // latest-at-or-before row either is within the gap or there is no
    // match at all).
    QueryDef(
      "q_asof_tolerance",
      """WITH v AS (
        |  SELECT user_id, ts::TIMESTAMP AS vts, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts::TIMESTAMP),
        |p AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS pts, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.pts, '%Y-%m-%dT%H:%M:%S.%gZ') AS purchase_time,
        |  CASE WHEN v.vts IS NOT NULL AND p.pts - v.vts <= INTERVAL 600 SECOND
        |    THEN v.view_id END AS last_view_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.pts >= v.vts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_id"))
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("view_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      asofJoin(purchases, views, Seq("user_id"), Seq("v_user"), "ts", "v_ts",
        tolerance = Some(600L * 1000000)) // 10 min in µs
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), IsoMs).as("purchase_time"),
          col("view_id").as("last_view_id"))
        .orderBy("event_id")
    })
}
