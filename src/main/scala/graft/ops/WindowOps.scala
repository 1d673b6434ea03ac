package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third window battery (SURVEY §2.6 widening): the full ranking/offset
  * function surface (lead/lag/ntile/percent_rank/cume_dist + running
  * first/last with an explicit ROWS frame), RANGE frames over a numeric
  * sort key, and keyset pagination — the serve-layer page shape that
  * stays O(page) at any offset, unlike OFFSET/LIMIT which scans and
  * discards every earlier row (reference serves ranges, not offsets:
  * src/api/routes/data.py:89-126).
  *
  * Oracle notes: every window is ordered by the unique (ts, event_id)
  * pair so ntile/percent_rank/cume_dist are deterministic; running
  * first/last use an EXPLICIT ROWS frame on both sides (engines differ
  * on the default frame's peer handling); the RANGE-frame sum runs over
  * DECIMAL(18,6) on both sides — a float sum's association order differs
  * between Spark's sequential frame evaluation and DuckDB's segment
  * trees, and decimal addition is exact so the order cannot matter.
  */
object WindowOps {

  private val IsoMs = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  val all: Seq[QueryDef] = Seq(

    // The offset/ranking function battery over one shuffle (all windows
    // share the same partitioning+ordering, so Catalyst plans a single
    // Exchange+Sort and evaluates every function in one Window operator).
    QueryDef(
      "q_window_funcs",
      """SELECT user_id, event_id,
        |  lag(value, 1) OVER w AS prev_val,
        |  lead(value, 1) OVER w AS next_val,
        |  CAST(ntile(4) OVER w AS BIGINT) AS tile,
        |  round(percent_rank() OVER w, 6) AS prank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_first,
        |  last_value(value) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_last
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_val"),
        lead(col("value"), 1).over(w).as("next_val"),
        ntile(4).over(w).cast(LongType).as("tile"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"),
        first(col("value")).over(wRows).as("run_first"),
        last(col("value")).over(wRows).as("run_last"))
        .orderBy("user_id", "event_id")
    },

    // RANGE frame over a numeric key: per-user 5-minute trailing sum.
    // The frame is defined by VALUE distance (all rows within 300s), not
    // row count — peers enter/leave together, so the result is
    // deterministic under any tie order.
    QueryDef(
      "q_window_range",
      """SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) // 1000000 AS sec,
        |  CAST(sum(CAST(value AS DECIMAL(18,6)))
        |    OVER (PARTITION BY user_id ORDER BY (epoch_us(ts::TIMESTAMP) // 1000000)
        |      RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail_sum
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .withColumn("sec", expr("unix_micros(ts) div 1000000"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-300, Window.currentRow)
      ev.select(
        col("user_id"), col("event_id"), col("sec"),
        sum(col("value").cast("decimal(18,6)")).over(w).cast(DoubleType).as("trail_sum"))
        .orderBy("user_id", "event_id")
    },

    // Keyset pagination: resume strictly after the anchor row under the
    // total (ts, event_id) order. TakeOrderedAndProject + the pushed
    // raw-column lower bound keep this O(page) however deep the cursor is —
    // OFFSET/LIMIT at page N would scan and discard N pages every call.
    QueryDef(
      "q_serve_page",
      """SELECT event_id, user_id, event_type,
        |  strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS time
        |FROM events
        |WHERE ts::TIMESTAMP > TIMESTAMP '2024-01-15 12:00:00'
        |   OR (ts::TIMESTAMP = TIMESTAMP '2024-01-15 12:00:00' AND event_id > 0)
        |ORDER BY ts::TIMESTAMP, event_id
        |LIMIT 100""".stripMargin) { (s, d) =>
      // ONE anchor constant: both the exact keyset predicate and the
      // coarse raw-ns scan bound derive from it, so the two can never
      // drift apart (a hand-edited anchor with a stale ns literal would
      // silently drop rows the keyset predicate should keep)
      val anchorInstant = java.time.Instant.parse("2024-01-15T12:00:00Z")
      val anchorTs = lit(anchorInstant.toString.replace("T", " ").stripSuffix("Z"))
        .cast(TimestampType)
      val ev = Tables.events(s, d)
      ev
        // coarse pushdown bound on the raw parquet column (statistics
        // pruning), then the exact keyset predicate on the µs timestamp
        .filter(Tables.tsAtLeast(ev, anchorInstant.minusSeconds(1)))
        .filter(col("ts") > anchorTs ||
          (col("ts") === anchorTs && col("event_id") > 0))
        // top-100 selected under the µs-precision (ts, event_id) order —
        // ordering by the ms-formatted string instead could pick a
        // different tail when two events share a millisecond
        .orderBy(col("ts"), col("event_id"))
        .limit(100)
        .select(
          col("event_id"), col("user_id"), col("event_type"),
          date_format(col("ts"), IsoMs).as("time"))
    })
}
