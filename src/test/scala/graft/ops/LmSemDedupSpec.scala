package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics pins for the LM perplexity scorers and SemDeDup first-win
  * pruning — the DuckDB oracle checks value equality end-to-end
  * (q_lm_*_ppl, q_semantic_dedup); these tests pin the PROPERTIES the
  * numbers must have.
  */
class LmSemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("unigram perplexity: uniform-vocab doc scores ~V-ish ppl; repetitive doc scores lower") {
    // corpus: one doc cycling a 4-token vocab evenly, one doc repeating a
    // single token. The repetitive doc concentrates probability mass ->
    // strictly lower perplexity.
    val docs = Seq(
      (1L, "a b c d a b c d a b c d"),
      (2L, "a a a a a a a a a a a a")).toDF("doc_id", "text")
    val got = LmOps.unigramPerplexity(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2) < got(1), s"repetition must lower unigram ppl: $got")
    // doc 1 sees p(a)=p(b)=p(c)=p(d) near (16/24, 4/24...) — its ppl is
    // bounded by the vocab size; sanity-box both
    assert(got(1) > 1.0 && got(1) < 8.0, got.toString)
    assert(got(2) > 1.0 && got(2) < got(1))
  }

  test("bigram perplexity: deterministic continuations approach ppl 1; single-token docs are excluded") {
    val docs = Seq(
      (1L, "x y x y x y x y x y x y x y x y"), // every continuation deterministic
      (2L, "a b c a c b b a c a b c"), //  mixed continuations
      (3L, "lonely")).toDF("doc_id", "text") // no bigrams
    val got = LmOps.bigramPerplexity(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(!got.exists(_._1 == 3L), "single-token doc has no bigram ppl row")
    val byId = got.map(t => t._1 -> t._3).toMap
    assert(byId(1L) < byId(2L), s"deterministic continuations must score lower: $byId")
    assert(byId(1L) < 2.0, s"x->y / y->x is near-certain under add-k: $byId")
  }

  test("semanticDedup first-win: chain a~b, b~c with a!~c keeps BOTH endpoints (not connected components)") {
    // 1-D directions can't make a cosine chain; use 2-D unit vectors at
    // angles 0, 60, 120 degrees with threshold cos(75deg)≈0.259 <- pairs
    // 0-60 and 60-120 match (cos=0.5), pair 0-120 does not (cos=-0.5).
    def vec(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val assigned = Seq(
      (10L, 0L, vec(0)), (20L, 0L, vec(60)), (30L, 0L, vec(120)),
      (40L, 1L, vec(0))) // same direction as 10 but DIFFERENT cluster: untouched
      .toDF("vec_id", "cluster", "emb")
      .withColumn("norm", lit(1.0))
    val got = SemDedupOps.semanticDedup(assigned, 0.3)
      .collect().map(r => (r.getLong(0), Option(r.get(2)).map(_.toString.toLong), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got === Seq(
      (10L, None, true), // earliest: kept
      (20L, Some(10L), false), // ~10 -> dropped, attributed to 10
      (30L, Some(20L), false), // ~20 only; greedy first-win still drops it
      (40L, None, true)), // cluster boundary: never compared to 10
      got.mkString(", "))
  }

  test("semanticDedup threshold boundary: cosine exactly AT the threshold drops (>=, the paper's closed ball)") {
    val assigned = Seq(
      (1L, 0L, Seq(1.0, 0.0)),
      (2L, 0L, Seq(0.5, math.sqrt(3) / 2))) // cos = 0.5 exactly
      .toDF("vec_id", "cluster", "emb")
      .withColumn("norm", lit(1.0))
    val got = SemDedupOps.semanticDedup(assigned, 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got === Map(1L -> true, 2L -> false))
  }
}
