package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan-shape contracts for the third window/text battery — the oracle
  * proves the answers; these prove the 100 TB shapes.
  */
class WindowOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_window_funcs: all eight functions share ONE Window operator and ONE exchange") {
    val p = plan("q_window_funcs")
    // operator lines print as "Window [lag(...), lead(...), ...]"
    val windows = "Window \\[".r.findAllIn(p).size
    assert(windows == 1,
      s"all eight functions must evaluate in ONE Window operator, got $windows:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1,
      s"same partitioning+ordering must plan ONE hash exchange, got $exchanges:\n$p")
  }

  test("q_bigram_mine: no exchange before the count aggregation (pairing is row-local)") {
    val p = plan("q_bigram_mine")
    // exactly the aggregation exchange (+ the final top-k sort's
    // singlePartition exchange, which TakeOrdered usually absorbs)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"bigram pairing must not shuffle tokens, got $hashEx exchanges:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count") ||
      p.contains("Partial"), s"count must partial-aggregate map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-50 must be TakeOrderedAndProject, not a global sort:\n$p")
  }

  test("q_serve_page: keyset page is TakeOrderedAndProject with a pushed ts bound") {
    val p = plan("q_serve_page")
    assert(p.contains("TakeOrderedAndProject"), s"page must not globally sort:\n$p")
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"),
      s"coarse raw-ts bound must reach the parquet scan:\n$p")
  }

  test("q_window_range results: trailing 5-minute sum includes exactly the in-range rows") {
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("q_window_range")(spark, sf).cache()
    // brute-force recompute on a sample of users via a self-join
    val ev = Tables.events(spark, sf)
      .withColumn("sec", expr("unix_micros(ts) div 1000000"))
      .select(col("user_id"), col("event_id"), col("sec"), col("value"))
      .filter(col("user_id") < 5)
    val brute = ev.as("a").join(ev.as("b"), col("a.user_id") === col("b.user_id") &&
        col("b.sec").between(col("a.sec") - 300, col("a.sec")))
      .groupBy(col("a.user_id").as("user_id"), col("a.event_id").as("event_id"))
      .agg(sum(col("b.value").cast("decimal(18,6)")).cast("double").as("brute_sum"))
    val joined = df.filter(col("user_id") < 5)
      .join(brute, Seq("user_id", "event_id"))
    assert(joined.count() > 0)
    val bad = joined.filter(abs(col("trail_sum") - col("brute_sum")) > 1e-9).count()
    assert(bad == 0, "window RANGE frame must equal the brute-force in-range sum")
    df.unpersist()
  }
}
