package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Data-selection battery invariants beyond the DuckDB hash oracle. */
class DataSelectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val d = "/root/testdata/sf0.001"

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, d)

  test("bloom-prefiltered decontamination is EXACTLY the plain-join result") {
    // the whole point of the rewrite: the bloom is semantics-free
    val exact = run("q_contamination").collect().toSet
    val bloom = run("q_contamination_bloom").collect().toSet
    assert(bloom == exact, "bloom twin must equal the exact formulation row-for-row")
  }

  test("DSIR: exactly top-100 selected, weights finite, rank respects the rounded weight") {
    val rows = run("q_dsir_weights").collect()
    val sel = rows.filter(_.getAs[Boolean]("selected"))
    assert(sel.length == math.min(100, rows.length))
    assert(rows.forall(r => !r.getAs[Double]("log_importance").isNaN))
    // no unselected doc outranks a selected one on (rounded weight, doc_id)
    val worstSel = sel.map(r =>
      (r.getAs[Double]("log_importance"), -r.getAs[Long]("doc_id"))).min
    val bestUnsel = rows.filterNot(_.getAs[Boolean]("selected")).map(r =>
      (r.getAs[Double]("log_importance"), -r.getAs[Long]("doc_id"))).max
    assert(bestUnsel._1 <= worstSel._1, s"selection boundary ordered: $bestUnsel vs $worstSel")
  }

  test("classifier: margin is a mean of [-1,1) weights and keep mirrors its sign") {
    val rows = run("q_quality_classifier").collect()
    assert(rows.nonEmpty)
    rows.foreach { r: Row =>
      val m = r.getAs[Double]("margin")
      assert(m >= -1.0 && m < 1.0, s"margin $m out of the weight hull")
      assert(r.getAs[Boolean]("keep") == (m > 0))
      assert(r.getAs[Long]("n_feats") > 0)
    }
  }
}
