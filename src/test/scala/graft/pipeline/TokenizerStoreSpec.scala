package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.{BpeTrain, Tables, UnigramLmOps}

/** [[TokenizerStore]]: persisted vocabularies must reload BIT-EXACTLY
  * (two "almost equal" vocabularies silently tokenize the same text
  * differently), preserve BPE's learned merge order, and pin versions
  * so a multi-job pipeline run can freeze its tokenizer while a
  * retrain commits on top.
  */
class TokenizerStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("unigram model round-trips bit-exactly; loaded model tokenizes identically") {
    val root = graft.TestTmp.dir("tokstore-uni")
    val (model, _) = UnigramLmOps.train(
      docs, vocabSize = 300, maxLen = 4, seedSize = 800, emIters = 1, pruneFrac = 0.5)
    TokenizerStore.saveUnigram(spark, root, model)
    val loaded = TokenizerStore.loadUnigram(spark, root)
    assert(loaded.logp === model.logp, "reload must be ==, not ≈")
    // identical Viterbi rendering AND identical sampled rendering
    // (sampling is a pure function of the model, so bit-exact reload
    // means bit-exact epoch renderings fleet-wide)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "word_idx", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(collect(UnigramLmOps.tokenize(docs, loaded, maxLen = 4))
      === collect(UnigramLmOps.tokenize(docs, model, maxLen = 4)))
    assert(collect(UnigramLmOps.sampleTokenize(docs, loaded, alpha = 0.3, seed = 7L, maxLen = 4))
      === collect(UnigramLmOps.sampleTokenize(docs, model, alpha = 0.3, seed = 7L, maxLen = 4)))
  }

  test("unigram versions pin: a retrain commits on top, readers at v1 still see the old vocab") {
    val root = graft.TestTmp.dir("tokstore-ver")
    val (m1, _) = UnigramLmOps.train(
      docs, vocabSize = 300, maxLen = 4, seedSize = 800, emIters = 1, pruneFrac = 0.5)
    TokenizerStore.saveUnigram(spark, root, m1)
    val v1 = TxTable.latest(spark, root)._1
    val (m2, _) = UnigramLmOps.train(
      docs, vocabSize = 150, maxLen = 3, seedSize = 400, emIters = 2, pruneFrac = 0.5)
    assert(m2.logp !== m1.logp, "fixture needs two distinct models")
    TokenizerStore.saveUnigram(spark, root, m2)
    assert(TokenizerStore.loadUnigram(spark, root).logp === m2.logp, "latest is the retrain")
    assert(TokenizerStore.loadUnigramAt(spark, root, v1).logp === m1.logp, "v1 is frozen")
  }

  test("corpus-growth retrain: warm-start from the stored vocab commits a new version, old version stays frozen") {
    import org.apache.spark.sql.functions._
    val root = graft.TestTmp.dir("tokstore-grow")
    val (m1, _) = UnigramLmOps.train(
      docs, vocabSize = 300, maxLen = 4, seedSize = 800, emIters = 1, pruneFrac = 0.5)
    TokenizerStore.saveUnigram(spark, root, m1)
    val v1 = TxTable.latest(spark, root)._1
    // the corpus grows (new docs, new characters); retrain WARM from
    // the stored vocab — the incremental path, not a from-scratch run
    val grown = docs.select("doc_id", "text").unionByName(
      Seq((900001L, "zzqx zzqx quartz jjxy zzqx quartz"),
        (900002L, "jjxy quartz zzqx jjxy")).toDF("doc_id", "text"))
    val (m2, _) = UnigramLmOps.train(
      grown, vocabSize = 300, maxLen = 4, seedSize = 800, emIters = 1,
      pruneFrac = 0.5, resume = Some(TokenizerStore.loadUnigram(spark, root)))
    assert(m2.logp.contains("z") && m2.logp.contains("j"),
      "warm retrain must cover the grown corpus's new characters")
    TokenizerStore.saveUnigram(spark, root, m2)
    // readers pinned at v1 are untouched by the growth retrain
    assert(TokenizerStore.loadUnigramAt(spark, root, v1).logp === m1.logp)
    assert(TokenizerStore.loadUnigram(spark, root).logp === m2.logp)
    // and the retrained vocab segments the grown corpus totally
    val seg = UnigramLmOps.tokenize(grown, m2, maxLen = 4)
    assert(seg.filter(col("piece").isNull).count() === 0L)
    assert(seg.select("doc_id").distinct().count() === grown.count())
  }

  test("BPE merge table round-trips in learned order; version pinning holds") {
    val corpus = Seq(
      (1L, "low low low low low lower lower newest newest newest"),
      (2L, "newest newest newest widest widest widest low lower")).toDF("doc_id", "text")
    val root = graft.TestTmp.dir("tokstore-bpe")
    val merges = BpeTrain.learnMerges(corpus, 12, minCount = 2)
    assert(merges.size >= 8)
    TokenizerStore.saveBpe(spark, root, merges)
    val v1 = TxTable.latest(spark, root)._1
    val loaded = TokenizerStore.loadBpe(spark, root)
    assert(loaded === merges, "order is load-bearing: reload must preserve learned order")
    assert(BpeTrain.encodeWord("newest", loaded) === BpeTrain.encodeWord("newest", merges))
    // a "retrain" with fewer merges commits on top; v1 stays intact
    TokenizerStore.saveBpe(spark, root, merges.take(4))
    assert(TokenizerStore.loadBpe(spark, root) === merges.take(4))
    assert(TokenizerStore.loadBpeAt(spark, root, v1) === merges)
  }

  test("BPE corpus-growth retrain: warm-start continuation from the stored table, old version frozen") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "low low low low low lower lower newest newest newest"),
      (2L, "newest newest newest widest widest widest low lower")).toDF("doc_id", "text")
    val root = graft.TestTmp.dir("tokstore-bpegrow")
    val m1 = BpeTrain.learnMerges(corpus, 8, minCount = 2)
    TokenizerStore.saveBpe(spark, root, m1)
    val v1 = TxTable.latest(spark, root)._1
    val grown = corpus.unionByName(
      Seq((3L, "zippy zippy zippy zippier zippier widest low")).toDF("doc_id", "text"))
    // incremental path: replay the STORED table, learn only the delta
    val m2 = BpeTrain.learnMerges(grown, 4, minCount = 2,
      resume = TokenizerStore.loadBpe(spark, root))
    assert(m2.take(m1.length) === m1, "stored prefix pinned across growth")
    TokenizerStore.saveBpe(spark, root, m2)
    assert(TokenizerStore.loadBpeAt(spark, root, v1) === m1, "v1 frozen")
    assert(TokenizerStore.loadBpe(spark, root) === m2)
    // the grown table still encodes the grown corpus reversibly
    for (w <- grown.select(col("text")).collect().flatMap(_.getString(0).split(" ")))
      assert(BpeTrain.encodeWord(w, m2).mkString("") === w + "</w>")
  }
}
