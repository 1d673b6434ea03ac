package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-analytics shapes over the `events` stream: cohort retention
  * and a strict-order conversion funnel — the two standard event-table
  * workloads a warehouse engine must express well.
  *
  * Scale shapes:
  *   - retention: two aggregates over one event scan (first-touch per
  *     user, distinct user-weeks), joined on user_id — every shuffle
  *     keys on user_id or (cohort, offset); no window, no driver state.
  *   - funnel: strict sequencing (first click AFTER first view, first
  *     purchase AFTER that click) is inherently staged — three
  *     event-type-pruned scans (the type predicate reaches parquet),
  *     each reduced to a user-level min before the next stage joins it
  *     back. The per-stage frames are user-dimension-sized, orders of
  *     magnitude under the event count; their joins co-partition on
  *     user_id. A single-pass window formulation would sort EVERY
  *     user's full event history instead.
  */
object FunnelOps {

  val all: Seq[QueryDef] = Seq(

    // Weekly cohort retention triangle: users bucketed by first-event
    // week, counted per whole-week offset of later activity.
    QueryDef(
      "q_cohort_retention",
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts::TIMESTAMP)) AS cohort
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts::TIMESTAMP) AS wk
        |  FROM events)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |  CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
        |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val first = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort"))
      val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk")).distinct()
      act.join(first, "user_id")
        .groupBy(
          col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast(LongType).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("users"))
        .select(
          date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("users"))
        .orderBy("cohort_week", "week_offset")
    },

    // Strict-order funnel view -> click -> purchase: each stage counts
    // users whose first qualifying event falls AFTER their previous
    // stage's timestamp (not merely users who did all three in any
    // order — the distinction IS the funnel). Confined to the first
    // day: the driver's synthetic stream is dense enough that an
    // unbounded window converts EVERYONE (a vacuous 1500/1500/1500 at
    // sf0.1); one day measures 56/19/3 at sf0.01 — a real funnel. The
    // day bound rides the raw scan column so it prunes at the parquet scan.
    QueryDef(
      "q_funnel_steps",
      """WITH e AS (
        |  SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-01'
        |    AND ts::TIMESTAMP < TIMESTAMP '2024-01-02'),
        |v AS (
        |  SELECT user_id, min(ts) AS t1
        |  FROM e WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(ts) AS t2
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(ts) AS t3
        |  FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
        |    CAST(count(*) AS BIGINT) AS users FROM v
        |  UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
        |  UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
        |ORDER BY stage""".stripMargin) { (s, d) =>
      val ev0 = Tables.events(s, d)
      val ev = ev0.filter(Tables.tsRange(ev0, "2024-01-01", "2024-01-02"))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      def stage(n: Int, name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("users"))
          .select(lit(n.toLong).as("stage"), lit(name).as("event_type"), col("users"))
      stage(1, "view", v).unionAll(stage(2, "click", c)).unionAll(stage(3, "purchase", p))
        .orderBy("stage")
    },

    // Event-time interval join: every purchase within 1 hour AFTER a
    // view by the same user. The join core below is stream-agnostic —
    // the SAME function runs here on batch frames (oracle twin) and in
    // graft.streaming.StreamingJoin on watermarked streams, so the
    // oracle certifies exactly the condition the streaming path
    // executes. delta_us is an exact integer (µs difference), so the
    // row hash is engine-stable with no float tier involved.
    QueryDef(
      "q_interval_join",
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |  epoch_us(p.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS delta_us
        |FROM events v JOIN events p
        |  ON v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND v.user_id = p.user_id
        |  AND p.ts::TIMESTAMP > v.ts::TIMESTAMP
        |  AND p.ts::TIMESTAMP <= v.ts::TIMESTAMP + INTERVAL 1 HOUR
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      viewPurchasePairs(
        e.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts")),
        e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts")))
        .orderBy("view_id", "purchase_id")
    },

    // Left-outer variant: EVERY view, with its purchases in the hour or
    // nulls — the "abandoned view" funnel metric, and in streaming form
    // the harder semantic (null-padded rows may only emit once the
    // watermark proves no match can still arrive; StreamingJoinSpec
    // pins that across checkpointed drains). Sort key coalesces the
    // nullable id: Spark orders NULLS FIRST, DuckDB NULLS LAST, so a
    // raw ORDER BY on purchase_id would shuffle the row order between
    // engines even with identical rows.
    QueryDef(
      "q_interval_join_left",
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |  epoch_us(p.ts::TIMESTAMP) - epoch_us(v.ts::TIMESTAMP) AS delta_us
        |FROM events v LEFT JOIN events p
        |  ON p.event_type = 'purchase'
        |  AND v.user_id = p.user_id
        |  AND p.ts::TIMESTAMP > v.ts::TIMESTAMP
        |  AND p.ts::TIMESTAMP <= v.ts::TIMESTAMP + INTERVAL 1 HOUR
        |WHERE v.event_type = 'view'
        |ORDER BY view_id, coalesce(purchase_id, -1)""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      viewPurchasePairs(
        e.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts")),
        e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts")),
        "left_outer")
        .orderBy(col("view_id"), coalesce(col("purchase_id"), lit(-1L)))
    })

  /** Interval-join core: purchases within (v_ts, v_ts + 1 hour] by the
    * same user. Stream-agnostic by construction — Structured Streaming's
    * unified Dataset API means this exact plan runs as a batch
    * sort-merge join on the equi-key (oracle twin above) AND as a
    * watermarked stream-stream join ([[graft.streaming.StreamingJoin]]),
    * where the time-range bound is what lets Spark evict state: view
    * rows are dropped once the watermark passes v_ts + 1 hour, purchase
    * rows once it passes p_ts. At 100 TB the batch shape is one shuffle
    * keyed on user_id with the range predicate evaluated post-merge —
    * never a time-unbounded cross product per user.
    *
    * Inputs: views(view_id, v_user, v_ts), purchases(purchase_id,
    * p_user, p_ts). Output: (view_id, purchase_id, delta_us).
    */
  def viewPurchasePairs(
      views: org.apache.spark.sql.DataFrame,
      purchases: org.apache.spark.sql.DataFrame,
      joinType: String = "inner"): org.apache.spark.sql.DataFrame =
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") > col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
      joinType)
      .select(
        col("view_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("delta_us"))
}
