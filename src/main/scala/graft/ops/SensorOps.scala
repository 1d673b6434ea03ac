package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's sensor-domain operators (SURVEY §2), realized over the
  * driver's `events` table (ts/user/type/value ≈ time/sensor/metric/value,
  * FIXTURES.md §4) so every one is DuckDB-oracle-checkable.
  *
  * Output conventions (oracle determinism, SURVEY §7.3): timestamps are
  * emitted as fixed-width UTC strings, doubles are rounded to 6 dp, every
  * query ends in a total ORDER BY with a unique tie-break.
  */
object SensorOps {

  private val IsoMs = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
  private val Sec = "yyyy-MM-dd HH:mm:ss"

  /** Deterministic raw sensor lines built from events — the Bronze analog.
    * Most lines are valid `"{ts} {name} {value}"`; three deterministic
    * slices are malformed to exercise the validation filters (missing
    * field / negative ts / digit-leading name), mirroring the reference's
    * invalid-line catalog (tests/conftest.py:21-34).
    */
  private def rawLines(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val tsStr = (lit(1700000000L) + col("event_id")).cast(StringType)
    val valStr = floor(col("value") * 100).cast(LongType).cast(StringType)
    e.select(
      col("event_id"),
      when(col("event_id") % 97 === 0, concat_ws(" ", tsStr, col("event_type")))
        .when(col("event_id") % 89 === 0,
          concat_ws(" ", concat(lit("-"), tsStr), col("event_type"), valStr))
        .when(col("event_id") % 83 === 0, concat_ws(" ", tsStr, lit("9bad"), valStr))
        .otherwise(concat_ws(" ", tsStr, col("event_type"), valStr))
        .as("raw_line"))
  }

  // concat_ws on BOTH sides: Spark's concat_ws skips NULL tokens while
  // plain DuckDB concat ignores only the NULL itself (keeping both
  // separators) — the two would build different lines if event_type or
  // value were ever NULL. ('-' || CAST ≡ Spark concat: NULL-propagating.)
  private val rawLinesSql =
    """SELECT event_id,
      |  CASE WHEN event_id % 97 = 0 THEN concat_ws(' ', CAST(1700000000 + event_id AS VARCHAR), event_type)
      |       WHEN event_id % 89 = 0 THEN concat_ws(' ', '-' || CAST(1700000000 + event_id AS VARCHAR), event_type, CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR))
      |       WHEN event_id % 83 = 0 THEN concat_ws(' ', CAST(1700000000 + event_id AS VARCHAR), '9bad', CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR))
      |       ELSE concat_ws(' ', CAST(1700000000 + event_id AS VARCHAR), event_type, CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR))
      |  END AS raw_line
      |FROM events""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // S3/P1/P2/P5-P7: tokenize, validate, cast — the whole Silver parse
    // (stg_readings.sql:48-99) over synthesized lines.
    QueryDef(
      "q_parse_lines",
      s"""WITH lines AS ($rawLinesSql),
         |toks AS (
         |  SELECT event_id AS raw_id,
         |    split_part(raw_line, ' ', 1) AS ts_str,
         |    split_part(raw_line, ' ', 2) AS name,
         |    split_part(raw_line, ' ', 3) AS value_str,
         |    len(string_split(raw_line, ' ')) AS n_tokens
         |  FROM lines
         |  WHERE raw_line IS NOT NULL AND length(trim(raw_line)) > 0)
         |SELECT raw_id,
         |  strftime(make_timestamp(CAST(ts_str AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS reading_time,
         |  name AS metric_name,
         |  round(CAST(value_str AS DOUBLE) / 100, 6) AS metric_value
         |FROM toks
         |WHERE n_tokens = 3
         |  AND regexp_matches(ts_str, '^\\d+$$')
         |  AND regexp_matches(name, '^[A-Za-z]')
         |  AND regexp_matches(value_str, '^-?\\d+\\.?\\d*$$')
         |ORDER BY raw_id""".stripMargin) { (s, d) =>
      val toks = split(col("raw_line"), " ")
      // try_element_at + coalesce('') ≡ Postgres/DuckDB SPLIT_PART on a
      // missing field (stg_readings.sql:48-50 returns '' there too).
      def tok(i: Int) = coalesce(try_element_at(toks, lit(i)), lit(""))
      rawLines(s, d)
        .filter(col("raw_line").isNotNull && length(trim(col("raw_line"))) > 0)
        .select(
          col("event_id").as("raw_id"),
          tok(1).as("ts_str"),
          tok(2).as("name"),
          tok(3).as("value_str"),
          size(toks).as("n_tokens"))
        .filter(
          col("n_tokens") === 3 &&
            col("ts_str").rlike("^\\d+$") &&
            col("name").rlike("^[A-Za-z]") &&
            col("value_str").rlike("^-?\\d+\\.?\\d*$"))
        .select(
          col("raw_id"),
          date_format(timestamp_seconds(col("ts_str").cast(LongType)), Sec).as("reading_time"),
          col("name").as("metric_name"),
          round(col("value_str").cast(DoubleType) / 100, 6).as("metric_value"))
        .orderBy("raw_id")
    },

    // P3: the three validation regexes as visible flags.
    QueryDef(
      "q_regex_validate",
      s"""WITH lines AS ($rawLinesSql)
         |SELECT event_id AS raw_id,
         |  regexp_matches(split_part(raw_line, ' ', 1), '^\\d+$$') AS ok_ts,
         |  regexp_matches(split_part(raw_line, ' ', 2), '^[A-Za-z]') AS ok_name,
         |  regexp_matches(split_part(raw_line, ' ', 3), '^-?\\d+\\.?\\d*$$') AS ok_value
         |FROM lines ORDER BY raw_id""".stripMargin) { (s, d) =>
      val toks = split(col("raw_line"), " ")
      def tok(i: Int) = coalesce(try_element_at(toks, lit(i)), lit(""))
      rawLines(s, d).select(
        col("event_id").as("raw_id"),
        tok(1).rlike("^\\d+$").as("ok_ts"),
        tok(2).rlike("^[A-Za-z]").as("ok_name"),
        tok(3).rlike("^-?\\d+\\.?\\d*$").as("ok_value"))
        .orderBy("raw_id")
    },

    // P5-P7: epoch seconds → timestamp → date.
    QueryDef(
      "q_cast_epoch",
      """SELECT event_id,
        |  1700000000 + event_id * 7 AS epoch_s,
        |  strftime(make_timestamp((1700000000 + event_id * 7) * 1000000), '%Y-%m-%d %H:%M:%S') AS reading_time,
        |  strftime(make_timestamp((1700000000 + event_id * 7) * 1000000), '%Y-%m-%d') AS reading_date
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val epoch = lit(1700000000L) + col("event_id") * 7
      Tables.events(s, d).select(
        col("event_id"),
        epoch.as("epoch_s"),
        date_format(timestamp_seconds(epoch), Sec).as("reading_time"),
        date_format(timestamp_seconds(epoch), "yyyy-MM-dd").as("reading_date"))
        .orderBy("event_id")
    },

    // F1/P16: half-open date-range filter (readings.py:37,43).
    QueryDef(
      "q_filter_range",
      """SELECT event_id,
        |  strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS time,
        |  event_type, value
        |FROM events
        |WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-05' AND ts::TIMESTAMP < TIMESTAMP '2024-01-20'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      ev
        // raw-column predicate: pushes to parquet row-group stats (a filter
        // on the converted/cast timestamp column blocks pushdown entirely)
        .filter(Tables.tsRange(ev, "2024-01-05", "2024-01-20"))
        .select(
          col("event_id"),
          date_format(col("ts"), IsoMs).as("time"),
          col("event_type"),
          col("value"))
        .orderBy("event_id")
    },

    // F2: IN-list filter (mart_daily_power.sql:34).
    QueryDef(
      "q_filter_isin",
      """SELECT event_id, event_type, value FROM events
        |WHERE event_type IN ('signup', 'purchase')
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    },

    // A1/F5/P9-P12: the flagship Gold aggregate — conditional-AVG pivot by
    // day, both-present guard, product projection (mart_daily_power.sql).
    // 'view'/'click' stand in for Voltage/Current.
    QueryDef(
      "q_daily_power",
      """SELECT 'Power' AS metric_name,
        |  round(avg_v * avg_c, 6) AS metric_value,
        |  strftime(d, '%Y-%m-%d') AS reading_date,
        |  strftime(d::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS reading_time
        |FROM (
        |  SELECT CAST(ts::TIMESTAMP AS DATE) AS d,
        |    avg(CASE WHEN event_type = 'view' THEN value END) AS avg_v,
        |    avg(CASE WHEN event_type = 'click' THEN value END) AS avg_c
        |  FROM events
        |  WHERE event_type IN ('view', 'click')
        |  GROUP BY 1)
        |WHERE avg_v IS NOT NULL AND avg_c IS NOT NULL
        |ORDER BY reading_date""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .groupBy(to_date(col("ts")).as("d"))
        .agg(
          avg(when(col("event_type") === "view", col("value"))).as("avg_v"),
          avg(when(col("event_type") === "click", col("value"))).as("avg_c"))
        .filter(col("avg_v").isNotNull && col("avg_c").isNotNull)
        .select(
          lit("Power").as("metric_name"),
          round(col("avg_v") * col("avg_c"), 6).as("metric_value"),
          date_format(col("d"), "yyyy-MM-dd").as("reading_date"),
          date_format(col("d").cast(TimestampType), IsoMs).as("reading_time"))
        .orderBy("reading_date")
    },

    // O1/O2: serve — two range-filtered branches, UNION ALL, total order
    // (readings.py:25-49).
    QueryDef(
      "q_union_ordered",
      """WITH silver AS (
        |  SELECT strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS time,
        |    event_type AS name, value
        |  FROM events
        |  WHERE event_type IN ('view', 'click')
        |    AND ts::TIMESTAMP >= TIMESTAMP '2024-01-05' AND ts::TIMESTAMP < TIMESTAMP '2024-01-20'),
        |gold AS (
        |  SELECT strftime(d::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS time,
        |    'Power' AS name, round(avg_v * avg_c, 6) AS value
        |  FROM (
        |    SELECT CAST(ts::TIMESTAMP AS DATE) AS d,
        |      avg(CASE WHEN event_type = 'view' THEN value END) AS avg_v,
        |      avg(CASE WHEN event_type = 'click' THEN value END) AS avg_c
        |    FROM events WHERE event_type IN ('view', 'click') GROUP BY 1)
        |  WHERE avg_v IS NOT NULL AND avg_c IS NOT NULL
        |    AND d >= DATE '2024-01-05' AND d < DATE '2024-01-20')
        |SELECT * FROM (SELECT * FROM silver UNION ALL SELECT * FROM gold)
        |ORDER BY time, name, value""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).filter(col("event_type").isin("view", "click"))
      val silver = e
        .filter(Tables.tsRange(e, "2024-01-05", "2024-01-20"))
        .select(
          date_format(col("ts"), IsoMs).as("time"),
          col("event_type").as("name"),
          col("value"))
      val gold = e
        .groupBy(to_date(col("ts")).as("d"))
        .agg(
          avg(when(col("event_type") === "view", col("value"))).as("avg_v"),
          avg(when(col("event_type") === "click", col("value"))).as("avg_c"))
        .filter(col("avg_v").isNotNull && col("avg_c").isNotNull)
        .filter(col("d") >= lit("2024-01-05") && col("d") < lit("2024-01-20"))
        .select(
          date_format(col("d").cast(TimestampType), IsoMs).as("time"),
          lit("Power").as("name"),
          round(col("avg_v") * col("avg_c"), 6).as("value"))
      silver.unionByName(gold).orderBy("time", "name", "value")
    },

    // A2/F3: scalar-MAX watermark filter (stg_readings.sql:32-38) as a
    // genuine Catalyst scalar subquery.
    QueryDef(
      "q_scalar_subquery_max",
      """SELECT event_id, event_type
        |FROM events
        |WHERE ts::TIMESTAMP > (SELECT max(ts::TIMESTAMP) - INTERVAL 7 DAY FROM events WHERE event_type = 'signup')
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("ev_wm")
      s.sql(
        """SELECT event_id, event_type FROM ev_wm
          |WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM ev_wm WHERE event_type = 'signup')
          |ORDER BY event_id""".stripMargin)
    },

    // F4/J1: affected-day reselect — IN-subquery ≡ left-semi join
    // (mart_daily_power.sql:36-46).
    QueryDef(
      "q_incremental_semi",
      """SELECT event_id, event_type,
        |  strftime(CAST(ts::TIMESTAMP AS DATE), '%Y-%m-%d') AS d
        |FROM events
        |WHERE CAST(ts::TIMESTAMP AS DATE) IN (
        |  SELECT DISTINCT CAST(ts::TIMESTAMP AS DATE) FROM events WHERE event_type = 'error')
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).withColumn("d", to_date(col("ts")))
      val affected = e.filter(col("event_type") === "error").select("d").distinct()
      // BROADCAST the distinct-day side: it is bounded by the calendar
      // (#days), so the semi join must never shuffle the fact side — a
      // plain semi join would hash-exchange the full events table on `d`
      // at 100×. The day-side scan is column-pruned (ts + pushed
      // event_type filter), so the "second scan" reads a sliver.
      e.join(broadcast(affected), Seq("d"), "left_semi")
        .select(col("event_id"), col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("d"))
        .orderBy("event_id")
    },

    // W1: row_number window — latest event per user (SURVEY §2.6).
    QueryDef(
      "q_window_rownum",
      """SELECT user_id, event_id, event_type,
        |  strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS time
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("user_id"),
          col("event_id"),
          col("event_type"),
          date_format(col("ts"), IsoMs).as("time"))
        .orderBy("user_id")
    },

    // A5: first-writer-wins dedup by key (merge unique_key semantics,
    // stg_readings.sql:16).
    QueryDef(
      "q_dedup_firstwin",
      """SELECT user_id, event_type, event_id, value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts::TIMESTAMP, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
        .orderBy("user_id", "event_type")
    },

    // P14: multi-format timestamp parse (data.py:129-147) — build strings
    // in 3 formats, parse back via coalesce-of-formats.
    QueryDef(
      "q_multiformat_ts",
      """WITH strs AS (
        |  SELECT event_id,
        |    CASE CAST(event_id % 3 AS INTEGER)
        |      WHEN 0 THEN strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ')
        |      WHEN 1 THEN strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S')
        |      ELSE strftime(ts::TIMESTAMP, '%Y-%m-%d')
        |    END AS s
        |  FROM events)
        |SELECT event_id, s,
        |  strftime(coalesce(
        |    try_strptime(s, '%Y-%m-%dT%H:%M:%S.%gZ'),
        |    try_strptime(s, '%Y-%m-%dT%H:%M:%S'),
        |    try_strptime(s, '%Y-%m-%d')), '%Y-%m-%d %H:%M:%S.%g') AS parsed
        |FROM strs ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(
        col("event_id"),
        when(col("event_id") % 3 === 0, date_format(col("ts"), IsoMs))
          .when(col("event_id") % 3 === 1, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd"))
          .as("s"))
      e.select(
        col("event_id"),
        col("s"),
        date_format(
          coalesce(
            try_to_timestamp(col("s"), lit(IsoMs)),
            try_to_timestamp(col("s"), lit("yyyy-MM-dd'T'HH:mm:ss")),
            try_to_timestamp(col("s"), lit("yyyy-MM-dd"))),
          "yyyy-MM-dd HH:mm:ss.SSS").as("parsed"))
        .orderBy("event_id")
    },

    // P15: ms-truncated ISO-8601 Z formatter (data.py:150-153).
    QueryDef(
      "q_format_iso_millis",
      """SELECT event_id, strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S.%gZ') AS time
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), date_format(col("ts"), IsoMs).as("time"))
        .orderBy("event_id")
    },

    // Streaming-shape batch twin: 1-hour tumbling window aggregate
    // (SURVEY §2.9 — window() over event time).
    QueryDef(
      "q_tumbling_window",
      """SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 6) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
        .select(
          date_format(col("w.start"), Sec).as("window_start"),
          col("event_type"),
          col("n"),
          col("total"))
        .orderBy("window_start", "event_type")
    },

    // JSON extraction over the events.props column (extension surface).
    QueryDef(
      "q_json_extract",
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .orderBy("event_id")
    })
}
