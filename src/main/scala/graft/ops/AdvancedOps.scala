package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Advanced operator block: as-of join, session windows, sliding windows,
  * pivot/unpivot, lateral explode-with-position, deterministic hash
  * sampling, and two TPC-H-shaped multi-join aggregates.
  *
  * As-of join is implemented sort-based (union the two sides, one window
  * pass carrying the last right-side value forward) — the standard
  * shuffle-once plan that scales to any size without a range-join
  * explosion; the DuckDB oracle uses its native ASOF JOIN, so the two
  * independent formulations check each other.
  */
object AdvancedOps {

  private val IsoMs = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
  private val Sec = "yyyy-MM-dd HH:mm:ss"

  val all: Seq[QueryDef] = Seq(

    // As-of join: for each purchase, the latest view by the same user at
    // or before the purchase time.
    QueryDef(
      "q_asof_join",
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
      // dedupe right side to one view per (user, µs) for a deterministic match
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_id"))
        .select(col("user_id"), col("ts"), col("view_id"), lit(0).as("side"),
          lit(null).cast(LongType).as("event_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(null).cast(LongType).as("view_id"),
          lit(1).as("side"), col("event_id"))
      // one sort per user: right rows (side 0) precede left rows at equal
      // ts, and last(ignoreNulls) carries the latest view_id forward
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("view_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(purchases)
        .withColumn("last_view_id", last(col("view_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), IsoMs).as("purchase_time"),
          col("last_view_id"))
        .orderBy("event_id")
    },

    // Session windows (30-min gap) per user — Spark session_window vs the
    // classic gaps-and-islands SQL (new session when gap >= 30 min,
    // matching session_window's exclusive end).
    QueryDef(
      "q_session_window",
      """WITH g AS (
        |  SELECT user_id, ts::TIMESTAMP AS t,
        |    coalesce(lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP), ts::TIMESTAMP) AS prev
        |  FROM events),
        |sess AS (
        |  SELECT user_id, t,
        |    sum(CASE WHEN epoch(t) - epoch(prev) >= 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY t) AS sid
        |  FROM g)
        |SELECT user_id,
        |  strftime(min(t), '%Y-%m-%dT%H:%M:%S.%gZ') AS session_start,
        |  strftime(max(t), '%Y-%m-%dT%H:%M:%S.%gZ') AS last_event,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), max(col("ts")).as("last_ts"))
        .select(
          col("user_id"),
          date_format(col("w.start"), IsoMs).as("session_start"),
          date_format(col("last_ts"), IsoMs).as("last_event"),
          col("n"))
        .orderBy("user_id", "session_start")
    },

    // Sliding window: 2-hour windows sliding by 1 hour (each event in 2
    // windows).
    QueryDef(
      "q_sliding_window",
      """WITH w AS (
        |  SELECT date_trunc('hour', ts::TIMESTAMP) AS ws, value FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts::TIMESTAMP) - INTERVAL 1 HOUR, value FROM events)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(value), 6) AS total
        |FROM w GROUP BY ws ORDER BY window_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total"))
        .select(date_format(col("w.start"), Sec).as("window_start"), col("n"), col("total"))
        .orderBy("window_start")
    },

    // Pivot: per-day mean value by event type, fixed column set.
    QueryDef(
      "q_pivot",
      """SELECT strftime(CAST(ts::TIMESTAMP AS DATE), '%Y-%m-%d') AS d,
        |  round(avg(CASE WHEN event_type = 'click' THEN value END), 6) AS click,
        |  round(avg(CASE WHEN event_type = 'error' THEN value END), 6) AS error,
        |  round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS purchase,
        |  round(avg(CASE WHEN event_type = 'signup' THEN value END), 6) AS signup,
        |  round(avg(CASE WHEN event_type = 'view' THEN value END), 6) AS view
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("d"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(avg(col("value")), 6))
        .orderBy("d")
    },

    // Unpivot (melt): part measures to long form.
    QueryDef(
      "q_unpivot",
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part)
        |ORDER BY p_partkey, attr""".stripMargin) { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          col("p_retailprice").as("retailprice"),
          col("p_size").cast(DoubleType).as("size"))
        .unpivot(Array(col("p_partkey")), Array(col("retailprice"), col("size")), "attr", "val")
        .orderBy("p_partkey", "attr")
    },

    // Lateral explode with position (generator / flatMap surface).
    QueryDef(
      "q_posexplode",
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |  unnest(range(1, len(toks) + 1)) AS t(i)
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      // posexplode's pos is int — cast to long to match DuckDB's BIGINT i
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos")
    },

    // Deterministic hash sampling: md5-prefix threshold — identical
    // sample on any engine, stable under reshuffling/re-partitioning
    // (unlike rand()-based sampling).
    QueryDef(
      "q_hash_sample",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(substring(md5(col("o_orderkey").cast(StringType)), 1, 1).isin("0", "1"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    // revenue per order, top 10. Dim side broadcast; lineitem never
    // shuffled except the final aggregation on o_orderkey.
    QueryDef(
      "q_tpch_q3",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      // Hint policy: no explicit broadcast on customer/orders — they are
      // fact-sized at production scale; AQE auto-broadcasts them at test
      // SFs and falls back to shuffle joins beyond the threshold.
      Tables.lineitem(s, d)
        .join(
          Tables.orders(s, d).join(
            Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"),
            col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"))
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q6: the selective-scan aggregate — all three predicates must
    // reach the parquet scan (range on date, between on discount, < on
    // quantity); one partial+final agg, no shuffle of data rows.
    QueryDef(
      "q_tpch_q6",
      """SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
        .agg(
          round(sum(col("l_extendedprice") * col("l_discount")), 6).as("revenue"),
          count(lit(1)).as("n"))
    },

    // Conditional / null-handling battery: nullif, ifnull, nvl2-shape,
    // greatest/least, nested CASE — over a column made nullable on
    // purpose (nullif on a real value).
    QueryDef(
      "q_conditional_funcs",
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'P') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
        |  CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 'was_p' ELSE 'not_p' END AS nvl2_shape,
        |  greatest(o_totalprice, 100000.0) AS floor100k,
        |  least(o_totalprice, 100000.0) AS cap100k,
        |  CASE WHEN o_totalprice > 300000 THEN 'hi'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'lo' END AS bucket
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("PENDING")).as("status_filled"),
        when(nullif(col("o_orderstatus"), lit("P")).isNull, "was_p").otherwise("not_p").as("nvl2_shape"),
        greatest(col("o_totalprice"), lit(100000.0)).as("floor100k"),
        least(col("o_totalprice"), lit(100000.0)).as("cap100k"),
        when(col("o_totalprice") > 300000, "hi")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("lo").as("bucket"))
        .orderBy("o_orderkey")
    },

    // Regex capture groups + replace-with-backreference.
    QueryDef(
      "q_regex_funcs",
      """SELECT p_partkey,
        |  regexp_extract(p_type, '(\w+) (\w+)', 1) AS first_word,
        |  regexp_extract(p_type, '(\w+) (\w+)', 2) AS second_word,
        |  regexp_replace(p_type, '(\w+) (\w+)', '\2-\1', 'g') AS swapped,
        |  regexp_matches(p_name, '^[a-z]+ [a-z]+') AS two_lower_words
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "(\\w+) (\\w+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "(\\w+) (\\w+)", 2).as("second_word"),
        regexp_replace(col("p_type"), "(\\w+) (\\w+)", "$2-$1").as("swapped"),
        col("p_name").rlike("^[a-z]+ [a-z]+").as("two_lower_words"))
        .orderBy("p_partkey")
    },

    // TPC-H Q5 shape: local (customer-nation = supplier-nation) revenue
    // per nation within one region.
    QueryDef(
      "q_tpch_q5",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = (SELECT min(r_name) FROM region)
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      // broadcast() only on structurally small dims (region/nation/
      // supplier); customer/orders are fact-sized at production scale —
      // AQE picks broadcast at test SFs, shuffle joins beyond.
      val region = Tables.region(s, d)
      val minRegion = region.agg(min(col("r_name")).as("r_name"))
      val dims = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region.join(broadcast(minRegion), Seq("r_name"), "left_semi")),
          col("n_regionkey") === col("r_regionkey"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).join(dims, col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Range (interval) join, equi-join-ified: every (purchase, view)
    // pair by the same user within ±300 s. A raw |pt−vt| <= W join
    // condition plans a nested-loop (O(n²) per user); bucketing time
    // into W-wide cells and exploding ONE side to its 3 adjacent cells
    // turns it into a plain hash equi-join on (user, bucket) + an
    // exact refine — each qualifying pair matches in EXACTLY one
    // bucket (the purchase's own), so no dedup pass is needed. The
    // oracle runs the raw inequality join; both sides compare
    // µs-truncated timestamps so the boundary is engine-identical.
    QueryDef(
      "q_range_join",
      """WITH v AS (
        |  SELECT user_id, event_id AS view_id, ts::TIMESTAMP AS vts
        |  FROM events WHERE event_type = 'view'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id, ts::TIMESTAMP AS pts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, v.view_id,
        |  CAST(datediff('microseconds', v.vts, p.pts) AS BIGINT) AS gap_us
        |FROM p JOIN v ON p.user_id = v.user_id
        |  AND p.pts BETWEEN v.vts - INTERVAL 300 SECOND AND v.vts + INTERVAL 300 SECOND
        |ORDER BY p.purchase_id, v.view_id""".stripMargin) { (s, d) =>
      val wUs = 300L * 1000000
      val e = Tables.events(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("p_us"))
        .withColumn("bkt", expr(s"p_us div $wUs"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
          unix_micros(col("ts")).as("v_us"))
        .withColumn("vb", expr(s"v_us div $wUs"))
        .withColumn("bkt", explode(array(col("vb") - 1, col("vb"), col("vb") + 1)))
      p.join(v,
        col("user_id") === col("v_user") && p("bkt") === v("bkt") &&
          abs(col("p_us") - col("v_us")) <= wUs)
        .select(col("purchase_id"), col("view_id"),
          (col("p_us") - col("v_us")).as("gap_us"))
        .orderBy("purchase_id", "view_id")
    })
}
