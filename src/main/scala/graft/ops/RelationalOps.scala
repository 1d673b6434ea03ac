package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Quality

/** Generic relational operators (SURVEY §2.4, §2.5, §2.7, §2.8) verified on
  * the TPC-H-shaped driver tables. Join strategy notes are in each query:
  * dimension sides are explicitly `broadcast()` so the 100 TB plan is a
  * broadcast-hash join with no shuffle of the fact table.
  */
object RelationalOps {

  val all: Seq[QueryDef] = Seq(

    // S3: scan + projection + column pruning — ReadSchema must show only
    // the 4 projected columns.
    QueryDef(
      "q_scan_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // A4 + full aggregate battery (TPC-H Q1 shape): one shuffle, partial
    // aggregation map-side.
    QueryDef(
      "q_agg_stats",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l_quantity), 6) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
        |  round(avg(l_extendedprice), 6) AS avg_price,
        |  round(min(l_discount), 6) AS min_disc,
        |  round(max(l_tax), 6) AS max_tax
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 6).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("sum_disc_price"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(min(col("l_discount")), 6).as("min_disc"),
          round(max(col("l_tax")), 6).as("max_tax"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // O3: top-k — Spark plans TakeOrderedAndProject (no full sort at scale).
    QueryDef(
      "q_topk",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // J2-analog inner equi-join chain, dims broadcast.
    QueryDef(
      "q_join_inner",
      """SELECT o_orderkey, c_name, n_name, o_totalprice
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("o_orderkey", "c_name", "n_name", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // Left outer join + aggregate: per-customer order stats incl. zero.
    QueryDef(
      "q_join_left",
      """SELECT c_custkey,
        |  CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 6) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 6).as("total_spent"))
        .orderBy("c_custkey")
    },

    // J1: left-semi (EXISTS).
    QueryDef(
      "q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J3: left-anti (NOT EXISTS) — the merge building block (SURVEY §4.3).
    // Filtered right side keeps the result non-empty (every customer has
    // SOME order in this data; a 0-row oracle match would be vacuous).
    QueryDef(
      "q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // §2.8: the dbt data-quality surface as one-pass conditional-sum
    // aggregation over orders (Quality ADT).
    QueryDef(
      "q_quality_checks",
      """SELECT check_name, violations FROM (
        |  SELECT 'not_null_o_orderkey' AS check_name,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations FROM orders
        |  UNION ALL
        |  SELECT 'not_null_o_custkey',
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'accepted_values_o_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'totalprice_non_negative',
        |    CAST(sum(CASE WHEN NOT (o_totalprice >= 0) THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'unique_o_orderkey',
        |    CAST(coalesce((SELECT sum(c) FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey HAVING count(*) > 1)), 0) AS BIGINT)
        |) ORDER BY check_name""".stripMargin) { (s, d) =>
      Quality.run(
        Tables.orders(s, d),
        Seq(
          Quality.NotNull("o_orderkey"),
          Quality.NotNull("o_custkey"),
          Quality.AcceptedValues("o_orderstatus", Seq("O", "F", "P")),
          Quality.ExpressionIsTrue("totalprice_non_negative", col("o_totalprice") >= 0),
          Quality.Unique("o_orderkey")))
        .orderBy("check_name")
    })
}
