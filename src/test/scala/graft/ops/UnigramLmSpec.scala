package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.UnigramLmOps.UnigramModel

/** [[UnigramLmOps]] vs an INDEPENDENT in-memory sequential trainer: the
  * distributed hard-EM must be value-identical (it is exact long
  * counting + driver renormalization — no float summation-order slack
  * in the model itself), segmentation must reconstruct every word, and
  * training must be partitioning-invariant.
  *
  * The sequential reference implements the same contract (seed by
  * substring weight, Viterbi tie-break toward fewer pieces then
  * earliest split, Laplace-1 floor, char coverage floor, prune by
  * lowest logp) with its own code: a memoized recursive DP instead of
  * the iterative array DP, plain Map folds instead of DataFrames.
  */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- independent sequential reference ----------------------------

  private def refWordFreq(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def refSeed(wf: Map[String, Long], maxLen: Int, seedSize: Int): Map[String, Long] = {
    val subs = scala.collection.mutable.Map.empty[String, Long]
    for ((w, n) <- wf; i <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - i)) {
      val p = w.substring(i, i + l)
      subs(p) = subs.getOrElse(p, 0L) + n
    }
    val top = subs.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    (top ++ subs.filter(_._1.length == 1)).toMap
  }

  /** Memoized recursive Viterbi — same tie-break contract, different
    * code shape from the production array DP.
    */
  private def refViterbi(
      word: String, logp: Map[String, Double], maxLen: Int): Option[Seq[String]] = {
    val memo = scala.collection.mutable.Map.empty[Int, Option[(Double, Int, Seq[String])]]
    // best segmentation of word[0, i): (score, nPieces, pieces)
    def best(i: Int): Option[(Double, Int, Seq[String])] = memo.getOrElseUpdate(i, {
      if (i == 0) Some((0.0, 0, Nil))
      else {
        val cands = for {
          j <- (math.max(0, i - maxLen) until i).toSeq
          lp <- logp.get(word.substring(j, i)).toSeq
          (s, c, ps) <- best(j).toSeq
        } yield (s + lp, c + 1, ps :+ word.substring(j, i), j)
        if (cands.isEmpty) None
        else {
          // strictly-better score; tie → fewer pieces; tie → smallest j.
          // cands are in j-ascending order, so maxBy with a strict
          // comparator keeps the earliest j on full ties.
          var bestC = cands.head
          for (c <- cands.tail)
            if (c._1 > bestC._1 || (c._1 == bestC._1 && c._2 < bestC._2)) bestC = c
          Some((bestC._1, bestC._2, bestC._3))
        }
      }
    })
    best(word.length).map(_._3)
  }

  private def refEmStep(
      wf: Map[String, Long], model: Map[String, Double], maxLen: Int
  ): (Map[String, Double], Double) = {
    var ll = 0.0
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, n) <- wf) {
      val segs = refViterbi(w, model, maxLen).get
      ll += segs.map(model).sum * n
      for (p <- segs) counts(p) = counts.getOrElse(p, 0L) + n
    }
    val kept = model.keys.filter(p => counts.contains(p) || p.length == 1).toSeq.sorted
    val total = kept.map(p => counts.getOrElse(p, 0L) + 1L).sum.toDouble
    (kept.map(p => p -> math.log((counts.getOrElse(p, 0L) + 1L) / total)).toMap, ll)
  }

  private def refTrain(
      docs: Seq[String], vocabSize: Int, maxLen: Int, seedSize: Int,
      emIters: Int, pruneFrac: Double): Map[String, Double] = {
    val wf = refWordFreq(docs)
    val seed = refSeed(wf, maxLen, seedSize)
    val total = seed.values.sum.toDouble
    var model = seed.map { case (p, c) => p -> math.log(c / total) }
    for (_ <- 0 until emIters) model = refEmStep(wf, model, maxLen)._1
    var done = false
    while (model.size > vocabSize && !done) {
      model = refEmStep(wf, model, maxLen)._1
      val multi = model.filter(_._1.length > 1)
      if (multi.isEmpty) done = true
      else {
        val nDrop = math.max(1, math.min(
          (multi.size * pruneFrac).toInt, model.size - vocabSize))
        val dropped = multi.toSeq.sortBy { case (p, lp) => (lp, p) }
          .take(nDrop).map(_._1).toSet
        model = model -- dropped
      }
    }
    if (!done) model = refEmStep(wf, model, maxLen)._1
    model
  }

  // ---- fixtures -----------------------------------------------------

  private val corpus = Seq(
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a hat and a mat for the cat",
    "hats and mats and cats",
    "the batter sat on the matter",
    "a pattern of cats and hats",
    "on and on the matter sat",
    "the the the cat cat hat")
  private def corpusDf = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("distributed hard-EM training equals the independent sequential reference exactly") {
    val (model, _) = UnigramLmOps.train(
      corpusDf, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 2, pruneFrac = 0.3)
    val refModel = refTrain(
      corpus, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 2, pruneFrac = 0.3)
    assert(model.logp.keySet === refModel.keySet)
    for ((p, lp) <- refModel)
      assert(math.abs(model.logp(p) - lp) < 1e-12, s"piece '$p'")
    // and the tokenizations agree word for word
    val got = UnigramLmOps.tokenize(corpusDf, model, maxLen = 4)
      .orderBy("doc_id", "word_idx", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = corpus.zipWithIndex.flatMap { case (t, id) =>
      t.split(" ").filter(_.nonEmpty).zipWithIndex.flatMap { case (w, wi) =>
        refViterbi(w, refModel, 4).get.zipWithIndex.map {
          case (p, pi) => (id.toLong, wi.toLong, pi.toLong, p)
        }
      }
    }
    assert(got.toSeq === want)
  }

  test("Viterbi log-likelihood is non-decreasing across EM steps (hard-EM monotonicity)") {
    val (_, lls) = UnigramLmOps.train(
      corpusDf, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 4, pruneFrac = 0.3)
    assert(lls.size === 4)
    for (i <- 1 until lls.size)
      assert(lls(i) >= lls(i - 1) - 1e-9 * math.abs(lls(i - 1)),
        s"LL decreased at step $i: ${lls(i - 1)} -> ${lls(i)}")
  }

  test("every word reconstructs from its pieces on real corpus data (char coverage floor)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (model, _) = UnigramLmOps.train(
      docs, vocabSize = 300, maxLen = 4, seedSize = 800, emIters = 1, pruneFrac = 0.5)
    val seg = UnigramLmOps.tokenize(docs, model, maxLen = 4)
    val rebuilt = seg.groupBy("doc_id", "word_idx")
      .agg(concat_ws("",
        sort_array(collect_list(struct(col("pos"), col("piece")))).getField("piece"))
        .as("joined"))
    val words = docs.select(col("doc_id"),
      posexplode(filter(split(col("text"), " "), w => length(w) > 0))
        .as(Seq("word_idx", "word")))
      .withColumn("word_idx", col("word_idx").cast("long"))
    val joined = words.join(rebuilt, Seq("doc_id", "word_idx"), "left")
    assert(joined.filter(col("joined").isNull || col("joined") =!= col("word")).count() === 0)
    // multi-char pieces actually get used (the model compresses)
    assert(seg.filter(length(col("piece")) > 1).count() > 0)
  }

  // ---- subword-regularization sampling ------------------------------

  test("sampled segmentations match the exact lattice posterior (crafted vocab)") {
    // vocab {a, b, ab}: word "ab" has exactly two segmentations —
    //   [ab]    with weight p(ab)^α
    //   [a][b]  with weight (p(a)·p(b))^α
    val logp = Map("a" -> math.log(0.3), "b" -> math.log(0.2), "ab" -> math.log(0.5))
    val alpha = 1.0
    val pJoint = 0.5
    val pSplit = 0.3 * 0.2
    val want = pJoint / (pJoint + pSplit) // P([ab]) ≈ 0.892857
    val n = 20000
    var joint = 0
    for (k <- 0 until n) {
      val seg = UnigramLmOps.sampleSegment(
        "ab", logp, maxLen = 2, alpha = alpha,
        i => PqOps.md5Dyadic(s"posterior:$k:$i") + 0.5)
      if (seg == Seq("ab")) joint += 1
      else assert(seg === Seq("a", "b"))
    }
    val got = joint.toDouble / n
    val sigma = math.sqrt(want * (1 - want) / n)
    assert(math.abs(got - want) < 4 * sigma,
      s"empirical P([ab]) = $got, lattice posterior = $want (4σ = ${4 * sigma})")
    // and α reweights it: at α=2 the joint becomes more likely
    val want2 = math.pow(pJoint, 2) / (math.pow(pJoint, 2) + math.pow(pSplit, 2))
    var joint2 = 0
    for (k <- 0 until n) {
      if (UnigramLmOps.sampleSegment("ab", logp, 2, 2.0,
        i => PqOps.md5Dyadic(s"posterior2:$k:$i") + 0.5) == Seq("ab")) joint2 += 1
    }
    assert(math.abs(joint2.toDouble / n - want2) < 4 * math.sqrt(want2 * (1 - want2) / n))
  }

  test("large α sharpens sampling to the max-score segmentation") {
    val logp = Map("a" -> math.log(0.3), "b" -> math.log(0.2), "ab" -> math.log(0.5))
    for (k <- 0 until 200)
      assert(UnigramLmOps.sampleSegment("ab", logp, 2, 50.0,
        i => PqOps.md5Dyadic(s"sharp:$k:$i") + 0.5) === Seq("ab"))
    // on a real trained model: every sampled path at α=10000 carries
    // the Viterbi score (exact ties may sample EITHER argmax path, so
    // the invariant is score equality, not piece equality)
    val (model, _) = UnigramLmOps.train(
      corpusDf, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 2, pruneFrac = 0.3)
    def score(ps: Seq[String]) = ps.map(model.logp).sum
    for (w <- corpus.flatMap(_.split(" ")).filter(_.nonEmpty).distinct; k <- 0 until 5) {
      val sampled = UnigramLmOps.sampleSegment(w, model.logp, 4, 10000.0,
        i => PqOps.md5Dyadic(s"argmax:$k:$w:$i") + 0.5)
      val viterbi = UnigramLmOps.viterbi(w, model.logp, 4).get
      assert(math.abs(score(sampled) - score(viterbi)) < 1e-9,
        s"word '$w' draw $k: sampled $sampled (${score(sampled)}) vs viterbi $viterbi (${score(viterbi)})")
    }
  }

  test("sampleTokenize: seed-deterministic, epoch-diverse, always reconstructs, partition-invariant") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (model, _) = UnigramLmOps.train(
      docs, vocabSize = 300, maxLen = 4, seedSize = 800, emIters = 1, pruneFrac = 0.5)
    def rows(seed: Long, parts: Int) =
      UnigramLmOps.sampleTokenize(docs.repartition(parts), model, alpha = 0.3, seed = seed, maxLen = 4)
        .orderBy("doc_id", "word_idx", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val e1 = rows(1L, 4)
    assert(e1 === rows(1L, 4), "same seed must replay identically")
    assert(e1 === rows(1L, 1), "sampling is row-local: partitioning must not change draws")
    assert(e1 !== rows(2L, 4), "different epochs must render differently at α=0.3")
    // every sampled rendering reconstructs the raw text
    val seg = UnigramLmOps.sampleTokenize(docs, model, alpha = 0.3, seed = 1L, maxLen = 4)
    val rebuilt = seg.groupBy("doc_id", "word_idx")
      .agg(concat_ws("",
        sort_array(collect_list(struct(col("pos"), col("piece")))).getField("piece"))
        .as("joined"))
    val words = docs.select(col("doc_id"),
      posexplode(filter(split(col("text"), " "), w => length(w) > 0))
        .as(Seq("word_idx", "word")))
      .withColumn("word_idx", col("word_idx").cast("long"))
    val joined = words.join(rebuilt, Seq("doc_id", "word_idx"), "left")
    assert(joined.filter(col("joined").isNull || col("joined") =!= col("word")).count() === 0)
    // regularization really happens: the sampled rendering differs
    // from the Viterbi argmax somewhere, and costs at least as many
    // pieces on aggregate
    val argmax = UnigramLmOps.tokenize(docs, model, maxLen = 4)
    assert(seg.count() >= argmax.count())
    assert(seg.exceptAll(argmax).count() > 0)
  }

  test("warm-start retrain from a converged model on an unchanged corpus is an identity (exactness pin)") {
    // hard EM reaches a fixed point on this corpus well inside 6
    // steps; at the fixed point every further emStep reproduces the
    // model bit-exactly, so a resumed retrain (same corpus, no new
    // chars → the stored model passes through warmSeed untouched)
    // must return EXACTLY the stored logp map
    val (converged, _) = UnigramLmOps.train(
      corpusDf, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 6, pruneFrac = 0.3)
    val (sanity, _) = UnigramLmOps.train(
      corpusDf, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 7, pruneFrac = 0.3)
    assert(sanity.logp === converged.logp, "corpus must be EM-converged for this pin")
    val (resumed, _) = UnigramLmOps.train(
      corpusDf, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 1,
      pruneFrac = 0.3, resume = Some(converged))
    assert(resumed.logp === converged.logp, "warm-start retrain must be ==, not ≈")
  }

  test("warm-start on a grown corpus covers new characters cold and keeps segmenting everything") {
    val (stored, _) = UnigramLmOps.train(
      corpusDf, vocabSize = 40, maxLen = 4, seedSize = 60, emIters = 2, pruneFrac = 0.3)
    // growth introduces characters the stored vocab has never seen
    val grown = (corpus ++ Seq("zq zq xyzzy quartz zq", "xyzzy quartz xyzzy"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (resumed, _) = UnigramLmOps.train(
      grown, vocabSize = 60, maxLen = 4, seedSize = 60, emIters = 2,
      pruneFrac = 0.3, resume = Some(stored))
    // coverage floor: every new char is a piece, every word segments
    for (c <- Seq("z", "q", "x", "y"))
      assert(resumed.logp.contains(c), s"new char '$c' must enter the vocab")
    val seg = UnigramLmOps.tokenize(grown, resumed, maxLen = 4)
    val rebuilt = seg.groupBy("doc_id", "word_idx")
      .agg(concat_ws("", sort_array(collect_list(struct(col("pos"), col("piece"))))
        .getField("piece")).as("joined"))
    val words = grown.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("word_idx", "word")))
      .filter(length(col("word")) > 0)
      .withColumn("word_idx", col("word_idx").cast("long"))
    val bad = words.join(rebuilt, Seq("doc_id", "word_idx"))
      .filter(col("joined") =!= col("word")).count()
    assert(bad === 0L, "every grown-corpus word must reconstruct under the resumed model")
    // documented divergence: from-scratch on the grown corpus may land
    // on a different (equally valid) fixed point — we assert only that
    // both are total; exactness is claimed ONLY for the unchanged-
    // corpus case above
  }

  test("empty / whitespace-only corpus fails fast with a clear message") {
    val empty = Seq((0L, ""), (1L, "   ")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      UnigramLmOps.train(empty, vocabSize = 40, maxLen = 4, seedSize = 60)
    }
    assert(e.getMessage.contains("whitespace-only corpus"))
  }

  test("training is partitioning-invariant (1 vs 8 partitions)") {
    val one = UnigramLmOps.train(
      corpusDf.repartition(1), vocabSize = 40, maxLen = 4,
      seedSize = 60, emIters = 2, pruneFrac = 0.3)._1
    val eight = UnigramLmOps.train(
      corpusDf.repartition(8), vocabSize = 40, maxLen = 4,
      seedSize = 60, emIters = 2, pruneFrac = 0.3)._1
    assert(one.logp.keySet === eight.logp.keySet)
    for ((p, lp) <- one.logp) assert(eight.logp(p) === lp, s"piece '$p'")
  }
}
