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

  // ---- interpolated Kneser–Ney -------------------------------------

  /** Independent sequential interpolated-KN reference (plain maps). */
  private def refKn(docs: Seq[(Long, String)], d: Double): Map[Long, (Long, Double)] = {
    val bgs = docs.flatMap { case (id, t) =>
      val w = t.split(" "); w.zip(w.drop(1)).map(p => (id, p))
    }
    val c2 = bgs.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val c1 = c2.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val nf = c2.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val np = c2.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val na = c2.size.toDouble
    docs.flatMap { case (id, t) =>
      val w = t.split(" ")
      val pairs = w.zip(w.drop(1))
      if (pairs.isEmpty) None
      else {
        val lp = pairs.map { p =>
          math.log(math.max(c2(p) - d, 0.0) / c1(p._1)
            + d * nf(p._1) / c1(p._1) * (np(p._2) / na))
        }.sum
        Some(id -> (pairs.length.toLong, math.exp(-lp / pairs.length)))
      }
    }.toMap
  }

  test("Kneser-Ney ppl matches an independent sequential reference; each context sums to 1") {
    val corpus = Seq(
      (1L, "san francisco san francisco san francisco new york new york"),
      (2L, "san francisco new york san francisco san york new san"),
      (3L, "a b a c a b a c b c a a b"),
      (4L, "lonely"))
    val docs = corpus.toDF("doc_id", "text")
    val got = LmOps.knPerplexity(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = refKn(corpus, 0.75)
    assert(got.keySet === want.keySet)
    assert(!got.contains(4L), "single-token doc has no bigram row")
    for ((id, (m, ppl)) <- want) {
      assert(got(id)._1 === m)
      assert(math.abs(got(id)._2 - ppl) < 1e-6, s"doc $id: ${got(id)._2} vs $ppl")
    }
    // the KN defining property: per observed context w1, the model is
    // a true distribution over the continuation-type space
    val bgs = corpus.flatMap { case (_, t) =>
      val w = t.split(" "); w.zip(w.drop(1))
    }
    val c2 = bgs.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = c2.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val nf = c2.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val np = c2.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val na = c2.size.toDouble
    val vocab2 = np.keys.toSeq
    for (w1 <- c1.keys) {
      val s = vocab2.map { w2 =>
        math.max(c2.getOrElse((w1, w2), 0.0) - 0.75, 0.0) / c1(w1) +
          0.75 * nf(w1) / c1(w1) * (np(w2) / na)
      }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"context '$w1' sums to $s")
    }
    // and the continuation insight is live: "francisco" is frequent but
    // follows ONLY "san", so its continuation probability is the
    // minimum type share, strictly below "york"'s (follows "new" AND
    // "san")
    assert(np(("francisco": String)) < np(("york": String)))
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
