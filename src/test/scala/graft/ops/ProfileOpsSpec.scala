package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileOpsSpec extends AnyFunSuite {
  private val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q_profile: one row per column, consistent counts, doc_id is a clean key") {
    val rows = q("q_profile").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    val nRows = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) == nRows), "n_rows must agree across columns")
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("doc_id").getLong(2) == 0L, "doc_id has no nulls")
    assert(byCol("doc_id").getLong(3) == nRows, "doc_id is distinct per row")
    assert(byCol("lang").getLong(3) <= 10, "lang cardinality is small")
    assert(byCol("n_chars").getString(4).toLong <= byCol("n_chars").getString(5).toLong)
  }

  test("q_domain_mix: smallest domain fully kept, larger domains thinned toward sqrt share") {
    val docs = Tables.documents(spark, sf)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = q("q_domain_mix").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cMin = before.values.min
    val minLangs = before.filter(_._2 == cMin).keys
    for (l <- minLangs)
      assert(after(l) == before(l), s"smallest domain $l must keep every doc")
    for ((l, c) <- before) {
      val rate = math.sqrt(cMin.toDouble / c)
      val kept = after.getOrElse(l, 0L).toDouble / c
      // md5 uniforms: binomial noise around the exact rate
      assert(math.abs(kept - rate) < 0.25, s"$l kept $kept, expected ~$rate")
    }
    // survivors are a subset of the corpus (no invented rows)
    assert(q("q_domain_mix").join(docs, Seq("doc_id"), "left_anti").isEmpty)
  }

  test("q_split_assign: 90/5/5 shares, total coverage, rerun-stable") {
    val a = q("q_split_assign").cache()
    val n = Tables.documents(spark, sf).count()
    assert(a.count() == n, "every doc gets a split")
    val shares = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    assert(math.abs(shares("train") - 0.9) < 0.06, s"train ${shares("train")}")
    assert(math.abs(shares("val") - 0.05) < 0.04, s"val ${shares.get("val")}")
    assert(math.abs(shares("test") - 0.05) < 0.04, s"test ${shares.get("test")}")
    // determinism: the assignment is a pure function of doc_id
    assert(q("q_split_assign").exceptAll(a).isEmpty)
    a.unpersist()
    ()
  }

  test("q_corpus_shuffle: positions are an exact permutation of 1..N and rerun-stable") {
    val s1 = q("q_corpus_shuffle").cache()
    val n = s1.count()
    assert(s1.select("pos").distinct().count() == n, "pos must be unique")
    val mm = s1.agg(min("pos"), max("pos")).head()
    assert(mm.getLong(0) == 1L && mm.getLong(1) == n, "pos covers 1..N with no gaps")
    assert(q("q_corpus_shuffle").exceptAll(s1).isEmpty, "shuffle is reproducible")
    s1.unpersist()
    ()
  }

  test("q_span_dedup: first carrier keeps its text; kept counts match the rebuilt text") {
    val docs = Tables.documents(spark, sf)
    val out = q("q_span_dedup").cache()
    assert(out.count() == docs.count())
    // the globally-smallest doc_id (>=5 tokens) is the first carrier of
    // every gram it holds — it must come through uncut
    val minId = docs.filter(size(split(col("text"), " ", -1)) >= 5)
      .agg(min("doc_id")).head().getLong(0)
    val orig = docs.filter(col("doc_id") === minId).head().getAs[String]("text")
    assert(out.filter(col("doc_id") === minId).head().getAs[String]("clean_text") == orig)
    // n_kept is exactly the token count of the rebuilt text
    val broken = out.filter(col("n_kept") =!=
      when(col("clean_text") === "", 0L).otherwise(size(split(col("clean_text"), " ", -1)).cast("long")))
    assert(broken.isEmpty, s"n_kept/text mismatch: ${broken.head(3).mkString}")
    // something was actually cut on this corpus (near-dups exist)
    assert(out.agg(sum("n_kept")).head().getLong(0) <
      docs.select(sum(size(split(col("text"), " ", -1)))).head().getLong(0))
    out.unpersist()
    ()
  }

  test("q_dup_spans: near-dup docs surface as shared spans with doc attribution") {
    val docs = Tables.documents(spark, sf)
    val spans = q("q_dup_spans").cache()
    val bad = spans.filter(col("n_docs") < 2 || col("first_doc") > col("last_doc")).count()
    assert(bad == 0)
    assert(spans.count() > 0, "near-dup corpus must surface shared spans")
    // cross-check one reported span against a driver-side recomputation:
    // both attributed docs must actually contain a 5-gram with that md5
    val probe = spans.orderBy("gram_md5").head()
    val (h, d1, d2) = (probe.getString(0), probe.getLong(2), probe.getLong(3))
    def grams(id: Long): Set[String] = {
      val toks = docs.filter(col("doc_id") === id).head().getAs[String]("text").split(" ")
      toks.sliding(5).filter(_.length == 5).map(w =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(w.mkString(" "))).toSet
    }
    assert(grams(d1).contains(h) && grams(d2).contains(h),
      s"span $h must appear in both attributed docs $d1 and $d2")
    spans.unpersist()
    ()
  }
}
