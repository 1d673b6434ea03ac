package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Plan/semantics checks for the third relational battery (answers are
  * oracle-proven; these pin the physical shapes and the gap-fill
  * contract the oracle can't express directly).
  */
class RelationalOps3Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_exists_corr decorrelates to a semi join — no per-row subquery") {
    val p = graft.SparkEntry.queries("q_exists_corr")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a left-semi join:\n$p")
    assert(!p.contains("InSubqueryExec"), s"no runtime subquery loop expected:\n$p")
  }

  test("q_gap_fill actually fills: spine days with no events appear with n=0 and a carried sum") {
    val df = graft.SparkEntry.queries("q_gap_fill")(spark, sf).cache()
    val gaps = df.filter(col("n") === 0)
    assert(gaps.count() > 0, "sf0.001 must contain at least one per-user calendar gap")
    assert(gaps.filter(col("filled_sum").isNull).count() == 0,
      "every gap day carries the last observed day's sum forward")
    // spine density: per user, rows == max(day)-min(day)+1
    val bad = df.groupBy("user_id")
      .agg(count(lit(1)).as("rows"),
        datediff(max(col("day")), min(col("day"))).as("spanm1"))
      .filter(col("rows") =!= col("spanm1") + 1)
      .count()
    assert(bad == 0, "the day spine must be dense per user")
    df.unpersist()
  }

  test("q_median_mode derived mode equals mode() semantics under a deterministic tie-break") {
    val rows = graft.SparkEntry.queries("q_median_mode")(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2))
    }
  }
}
