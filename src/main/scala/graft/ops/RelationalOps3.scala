package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third relational battery: the canonical TPC-H Q1, full-outer joins,
  * correlated EXISTS, calendar gap-fill with forward fill, ordered
  * string aggregation, exact median, deterministic mode, and the linear
  * regression aggregates — each oracle-checked against DuckDB.
  *
  * Determinism notes: mode() ties are engine-defined, so q_median_mode
  * derives the mode explicitly (count desc, value asc row_number) on
  * both sides; listagg orders WITHIN GROUP on both sides; the gap-fill
  * forward fill uses IGNORE NULLS last_value under a ROWS frame, which
  * both engines define identically.
  */
object RelationalOps3 {

  val all: Seq[QueryDef] = Seq(

    // The canonical TPC-H Q1 pricing summary (computed disc_price/charge
    // aggregates) — one scan, partial aggs, tiny result.
    QueryDef(
      "q_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 6) AS sum_qty,
        |  round(sum(l_extendedprice), 6) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate::TIMESTAMP <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 6).as("sum_qty"),
          round(sum(col("l_extendedprice")), 6).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 6).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Full outer join: customers with no orders AND (synthetic) order
    // keys with no customer both survive with null-padded sides.
    QueryDef(
      "q_full_outer",
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |  c.c_name,
        |  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
        |  round(coalesce(sum(o.o_totalprice), 0), 6) AS total
        |FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2
        |ORDER BY custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .groupBy(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 6).as("total"))
        .orderBy("custkey")
    },

    // Correlated EXISTS: orders having at least one big-ticket line —
    // planned as a left-semi join (the decorrelated form), proving the
    // subquery surface without a per-row loop.
    QueryDef(
      "q_exists_corr",
      """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 6) AS total
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 80000)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_ex")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_ex")
      s.sql(
        """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 6) AS total
          |FROM orders_ex o
          |WHERE EXISTS (
          |  SELECT 1 FROM lineitem_ex l
          |  WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 80000)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // Calendar gap-fill + forward fill: per-user daily event counts on a
    // dense min..max day spine (sequence+explode — the spine is
    // generated IN the row, no driver loop), missing days carried
    // forward from the last observed day.
    QueryDef(
      "q_gap_fill",
      """WITH daily AS (
        |  SELECT user_id, (ts::TIMESTAMP)::DATE AS day,
        |    CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS day_sum
        |  FROM events WHERE user_id < 20 GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM bounds)
        |SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
        |  coalesce(d.n, 0) AS n,
        |  last_value(d.day_sum IGNORE NULLS)
        |    OVER (PARTITION BY s.user_id ORDER BY s.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
        |FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
        |ORDER BY s.user_id, s.day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .filter(col("user_id") < 20)
        .groupBy(col("user_id"), col("ts").cast(DateType).as("day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("day_sum"))
      val spine = daily.groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(
          col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          last(col("day_sum"), ignoreNulls = true).over(w).as("filled_sum"))
        .orderBy("user_id", "day")
    },

    // Ordered string aggregation (listagg WITHIN GROUP) — the ORDER BY
    // inside the aggregate is what makes it oracle-able.
    QueryDef(
      "q_string_agg",
      """SELECT o_orderpriority,
        |  string_agg(o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderpriority", "o_orderstatus").distinct()
        .groupBy("o_orderpriority")
        .agg(
          // sort-then-join == listagg WITHIN GROUP, with a deterministic
          // order regardless of how partitions arrive at the agg
          array_join(array_sort(collect_list(col("o_orderstatus"))), "|").as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // Exact median + deterministic mode per group. mode() tie-breaks are
    // engine-defined, so the mode is DERIVED (count desc, value asc) the
    // same way on both sides.
    QueryDef(
      "q_median_mode",
      """WITH vc AS (
        |  SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT l_returnflag, l_quantity AS mode_qty,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, l_quantity) AS rn
        |  FROM vc)
        |SELECT med.l_returnflag, round(med.median_qty, 6) AS median_qty, m.mode_qty
        |FROM (SELECT l_returnflag, median(l_quantity) AS median_qty
        |      FROM lineitem GROUP BY 1) med
        |JOIN m ON med.l_returnflag = m.l_returnflag AND m.rn = 1
        |ORDER BY med.l_returnflag""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val med = li.groupBy("l_returnflag")
        .agg(round(median(col("l_quantity")), 6).as("median_qty"))
      val vc = li.groupBy("l_returnflag", "l_quantity").agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("c").desc, col("l_quantity"))
      val mode = vc.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"))
      med.join(mode, "l_returnflag")
        .select("l_returnflag", "median_qty", "mode_qty")
        .orderBy("l_returnflag")
    },

    // Bitwise aggregate family — bit_and/bit_or/bit_xor fold masks per
    // group in one pass (used for feature-flag rollups and
    // set-membership fingerprints).
    QueryDef(
      "q_bitwise_agg",
      """SELECT l_returnflag,
        |  CAST(bit_and(l_orderkey) AS BIGINT) AS b_and,
        |  CAST(bit_or(l_orderkey) AS BIGINT) AS b_or,
        |  CAST(bit_xor(l_orderkey) AS BIGINT) AS b_xor,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("bit_and(l_orderkey)").as("b_and"),
          expr("bit_or(l_orderkey)").as("b_or"),
          expr("bit_xor(l_orderkey)").as("b_xor"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // GROUPING() indicators distinguish real NULL keys from subtotal
    // rows — the piece rollup/cube reports need beyond coalesce labels.
    QueryDef(
      "q_grouping_id",
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        |  coalesce(l_linestatus, '(all)') AS status,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          grouping(col("l_returnflag")).cast(LongType).as("g_flag"),
          grouping(col("l_linestatus")).cast(LongType).as("g_status"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("status"),
          col("g_flag"), col("g_status"), col("n"))
        .orderBy("flag", "status")
    },

    // The percentile SCALE twin: approx_percentile (Greenwald-Khanna
    // summaries, bounded memory, mergeable map-side) next to the exact
    // form q_percentile uses. Exact percentile buffers every group value
    // — at 100 TB the approx path is the only viable plan. The raw GK
    // values aren't oracle-reproducible (summary-merge order), so the
    // query emits the exact group count plus IN-BOUNDS verdicts: each
    // approx quantile must land between the exact percentiles at q∓0.02
    // (GK rank error at accuracy 10000 is 1e-4 — 200× slack). DuckDB
    // re-derives the count and pins the verdicts true; a GK regression
    // flips a boolean and the hash.
    QueryDef(
      "q_percentile_approx",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  true AS p50_ok, true AS p90_ok, true AS p99_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          expr(
            "approx_percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D), 10000)").as("qs"),
          expr(
            "percentile(l_extendedprice, array(0.48D, 0.52D, 0.88D, 0.92D, 0.97D, 1.0D))").as("ex"))
        .select(
          col("l_returnflag"), col("n"),
          element_at(col("qs"), 1).between(
            element_at(col("ex"), 1), element_at(col("ex"), 2)).as("p50_ok"),
          element_at(col("qs"), 2).between(
            element_at(col("ex"), 3), element_at(col("ex"), 4)).as("p90_ok"),
          element_at(col("qs"), 3).between(
            element_at(col("ex"), 5), element_at(col("ex"), 6)).as("p99_ok"))
        .orderBy("l_returnflag")
    },

    // Linear-regression aggregates: price-vs-quantity slope/intercept/r²
    // per return flag — one aggregation pass, no ML-library dependence.
    QueryDef(
      "q_regression",
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 6) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 6).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 6).as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
        .orderBy("l_returnflag")
    })
}
