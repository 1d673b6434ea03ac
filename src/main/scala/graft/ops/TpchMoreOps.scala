package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second TPC-H batch (Q7/Q10/Q14/Q15/Q18/Q19 shapes, adapted to the
  * driver's simplified columns — no commitdate/shipmode/container, so
  * Q4/Q12-style queries are unexpressible here). Each exercises a
  * distinct optimizer/plan shape on the fact table:
  *
  *   - Q7: one fact pass with TWO nation dimensions broadcast under
  *     different aliases (supplier side vs customer side of the same
  *     25-row table), grouped by derived year.
  *   - Q10: returned-revenue top-k — selective returnflag+date filters
  *     pushed to the scans, 3-way join, TakeOrderedAndProject.
  *   - Q14: two conditional sums in ONE aggregate over one scan (no
  *     second pass for the denominator).
  *   - Q15: agg → window dense_rank ties-aware max (float-safe: ranked
  *     on the ROUNDED revenue, so Spark's and the oracle's summation
  *     orders cannot disagree about the winner).
  *   - Q18: self-aggregated having-subquery (large-volume orders)
  *     joined back — the agg output is orders-of-magnitude smaller than
  *     the fact, so the join back to orders/customer stays broadcast at
  *     any SF where the tail is genuinely rare.
  *   - Q19: disjunctive multi-column predicate spanning both join
  *     sides — the part-side conjuncts (brand, size) can't prune the
  *     lineitem scan, but the quantity bounds fold into one ORed scan
  *     filter; correctness of the OR-of-ANDs evaluation post-join is
  *     what the oracle checks.
  */
object TpchMoreOps {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_tpch_q7",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val n1 = Tables.nation(s, d).select(
        col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(
        col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(LongType).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    QueryDef(
      "q_tpch_q10",
      """SELECT c_custkey, c_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
        |  c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(
          Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    QueryDef(
      "q_tpch_q14",
      """SELECT round(
        |    100.0 * sum(CASE WHEN p_type = 'PROMO'
        |                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |      / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(round(
          lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(0)) / sum(rev),
          6).as("promo_revenue"))
    },

    QueryDef(
      "q_tpch_q15",
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 6) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey),
        |rk AS (SELECT *, dense_rank() OVER (ORDER BY total_revenue DESC) AS r FROM rev)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN rk ON s_suppkey = l_suppkey
        |WHERE r = 1 ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("total_revenue"))
      // the supplier-count-sized rank input makes the single-partition
      // window harmless; ranking on the ROUNDED value keeps the argmax
      // summation-order-proof
      val ranked = rev.withColumn("r", dense_rank().over(Window.orderBy(col("total_revenue").desc)))
        .filter(col("r") === 1)
      Tables.supplier(s, d)
        .join(broadcast(ranked), col("s_suppkey") === col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    QueryDef(
      "q_tpch_q18",
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice, qty
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 200)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(
          col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_totalprice"), col("qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // Q8: national market share — NATION_1's volume share per year
    // within ASIA's PROMO-part market. Two nation roles again (customer
    // region membership vs supplier nationality); the share is a
    // conditional-sum ratio like Q14.
    QueryDef(
      "q_tpch_q8",
      """SELECT year(o_orderdate) AS o_year,
        |  round(sum(CASE WHEN n2.n_name = 'NATION_1'
        |                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val n1 = Tables.nation(s, d).select(
        col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
      val n2 = Tables.nation(s, d).select(
        col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
          col("p_partkey") === col("l_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n1_region") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_1", vol).otherwise(0)) / sum(vol),
          6).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q13: customer order-count distribution — the LEFT-join histogram
    // (customers with zero orders must appear in the c_count=0 bucket,
    // which an inner join would silently drop).
    QueryDef(
      "q_tpch_q13",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q17: small-quantity-order revenue — a CORRELATED scalar threshold
    // (0.2 × that part's average quantity). The DataFrame form computes
    // the per-part averages as a plain aggregate and joins them back —
    // what Catalyst's subquery decorrelation would produce. avg of
    // integer-valued doubles is an exact sum / correctly-rounded
    // divide, so the threshold comparison cannot flip between engines.
    QueryDef(
      "q_tpch_q17",
      """SELECT round(sum(l_extendedprice) / 7.0, 6) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#3'
        |  AND l.l_quantity < (
        |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p.p_partkey)""".stripMargin) { (s, d) =>
      // only Brand#3 parts' averages are ever consumed — semi-join the
      // aggregate's input down by the brand selectivity before the
      // per-part groupBy (identical averages: each part's avg depends
      // only on its own rows)
      val brandParts = broadcast(
        Tables.part(s, d).filter(col("p_brand") === "Brand#3"))
      val partAvg = Tables.lineitem(s, d)
        .join(brandParts.select(col("p_partkey").as("bp_key")),
          col("bp_key") === col("l_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("avg_key"))
        .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_cap"))
      Tables.lineitem(s, d)
        .join(brandParts, col("p_partkey") === col("l_partkey"))
        .join(partAvg, col("avg_key") === col("l_partkey"))
        .filter(col("l_quantity") < col("qty_cap"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 6).as("avg_yearly"))
    },

    QueryDef(
      "q_tpch_q19",
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) && col("p_size").between(1, 5)) ||
            (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) && col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) && col("p_size").between(1, 15)))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"),
          count(lit(1)).as("n"))
    })
}
