package graft.ops

import org.apache.spark.sql.functions._

/** Rolling 7-day distinct active users — the canonical windowed-
  * DISTINCT workload. Spark's window functions do not support DISTINCT
  * aggregates, and buffering per-window user sets (collect_set over a
  * range frame) holds every window's members in memory; the scalable
  * formulation inverts the window: each (user, day) contributes itself
  * to the 7 window-ends it can count toward (a row-local explode of a
  * 7-element date sequence), and a plain countDistinct per window-end
  * finishes it. Shuffle cost: distinct (user, day) once, then the
  * 7×-amplified narrow pairs once — both keyed, no per-window state.
  * The oracle recomputes it relationally in DuckDB.
  */
object RollingOps {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_rolling_dau",
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts::TIMESTAMP AS DATE) AS day FROM events),
        |days AS (SELECT DISTINCT day FROM ud),
        |x AS (
        |  SELECT user_id, day + CAST(i AS INT) AS wday
        |  FROM ud, unnest(generate_series(0, 6)) AS g(i))
        |SELECT strftime(x.wday, '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS dau7
        |FROM x JOIN days ON x.wday = days.day
        |GROUP BY x.wday ORDER BY x.wday""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      // only window-ends that are OBSERVED days: without the semi join
      // the trailing 6 calendar days after the last event would report
      // phantom windows
      val days = ud.select(col("day").as("wday")).distinct()
      ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"))
        .join(days, Seq("wday"), "leftsemi")
        .groupBy("wday")
        .agg(countDistinct(col("user_id")).as("dau7"))
        .select(date_format(col("wday"), "yyyy-MM-dd").as("day"), col("dau7"))
        .orderBy("day")
    })
}
