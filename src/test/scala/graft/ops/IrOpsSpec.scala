package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[IrOps.rrfFuse]] closed forms: the RRF score is Σ 1/(60+rank) over
  * the legs a doc appears in, single-leg docs survive the full-outer
  * with a −1 sentinel on the absent side, and a doc ranked first in
  * both legs dominates any single-leg doc.
  */
class IrOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rrfFuse: exact scores, sentinel ranks, both-legs dominance") {
    // lex: doc 1 rank 1, doc 2 rank 2; vec: doc 1 rank 2, doc 3 rank 1
    val lex = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "lex_rank")
    val vec = Seq((1L, 2L), (3L, 1L)).toDF("vec_id", "vec_rank")
    val out = IrOps.rrfFuse(lex, vec).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def rr(r: Long) = 1.0 / (60 + r)
    assert(out(1L)._1 === 1L && out(1L)._2 === 2L)
    assert(math.abs(out(1L)._3 - BigDecimal(rr(1) + rr(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(out(2L) === ((2L, -1L, BigDecimal(rr(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(3L) === ((-1L, 1L, BigDecimal(rr(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // doc 1 (both legs) outranks doc 3 (best single leg)
    assert(out(1L)._3 > out(3L)._3)
  }
}
