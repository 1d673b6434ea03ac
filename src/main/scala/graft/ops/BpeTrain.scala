package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Word as a symbol sequence with its corpus frequency — the BPE
  * training unit.
  */
final case class BpeWord(syms: Seq[String], n: Long)

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): learn the
  * merge table from the corpus itself, not just apply a fixed one
  * (`bpe_tokens`/`q_bpe_tokens` is the application side).
  *
  * The classic algorithm is a loop over (count all adjacent symbol
  * pairs, merge the most frequent); its distributed shape here:
  *
  *   - the corpus collapses ONCE to a word-frequency table (one shuffle
  *     over words) — every later iteration works on DISTINCT words
  *     weighted by count, which is vocabulary-sized, not corpus-sized.
  *     This is what makes whole-corpus training tractable at 100 TB
  *     where the usual practice is single-node training on a sample.
  *   - per merge iteration: adjacent pairs come from a row-local
  *     zip-with-tail explode (no window, no self-join), ONE hash agg on
  *     (a, b) picks the winner, and exactly one row reaches the driver
  *     (the argmax — the scalar-watermark precedent, never data).
  *   - the merge application is a typed Dataset.map: per-row imperative
  *     leftmost-non-overlapping rewriting is genuinely iterative logic,
  *     the documented case where map beats any expression encoding.
  *   - lineage: each iteration caches its words table and every 8th is
  *     localCheckpoint'd (the connectedComponents discipline) so k
  *     merges never stack k plans.
  *
  * Determinism: ties on pair count break lexicographically on (a, b) —
  * training is a pure function of the corpus multiset, stable across
  * partitioning and reruns (spec'd 1-vs-8 partitions).
  */
object BpeTrain {

  /** Leftmost-first non-overlapping merge of adjacent (a, b) into a+b —
    * the standard BPE rewrite step.
    */
  private[ops] def mergePair(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Corpus -> word-frequency table, each word as its character
    * symbols plus the `</w>` end marker (so merges can distinguish
    * word-final units, per the original formulation).
    */
  def wordCounts(docs: DataFrame): Dataset[BpeWord] = {
    import docs.sparkSession.implicits._
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .map(r => BpeWord(r.getString(0).map(_.toString) :+ "</w>", r.getLong(1)))
  }

  /** Learn up to `numMerges` merges; stops early when the best pair
    * falls under `minCount`. Returns merges in learned order.
    *
    * `batch` > 1 is the fastBPE-style batched selection: each counting
    * job accepts up to `batch` pairs instead of one — greedily in
    * (count desc, a, b) order, restricted to pairs TOKEN-DISJOINT from
    * every pair already accepted this round (neither side equals an
    * accepted pair's `a`, `b`, or merged `a+b`). Disjointness makes
    * each accepted pair's count and its leftmost-nonoverlapping
    * application independent of the others (merging a+b can only
    * create/destroy adjacencies involving a, b, or ab), so the counts
    * recorded are exactly what per-merge recounting would have seen
    * for those pairs. What changes vs the classic loop is the ORDER:
    * classic recounting may rank a just-created pair (x, ab) above the
    * next disjoint pair; batching can't see it until the next round.
    * `batch = 1` (the default) IS the classic loop, bit-identical
    * (spec-pinned); batched training is still deterministic and
    * partition-invariant, it just learns a documented, slightly
    * different merge order — the throughput/fidelity knob, O(merges /
    * batch) driver round-trips instead of O(merges).
    */
  /** Warm-start continuation: `resume` is a previously learned merge
    * table (e.g. [[graft.pipeline.TokenizerStore.loadBpe]]); training
    * first REPLAYS it onto the (possibly grown) corpus in one map,
    * then learns up to `numMerges` ADDITIONAL merges, returning the
    * full table. The merge loop is Markovian in the words table —
    * its future depends only on the current symbol sequences — so on
    * an UNCHANGED corpus the continuation is EXACT:
    * `learnMerges(docs, a + b) == learnMerges(docs, b, resume =
    * learnMerges(docs, a))` (spec-pinned; the tokenizer twin of
    * SgnsOps' epochOffset contract). On a grown corpus the replayed
    * prefix is pinned (production vocabulary stability) and only the
    * continuation sees the new counts — the documented divergence
    * from a from-scratch retrain, which could reorder even the
    * prefix. */
  def learnMerges(
      docs: DataFrame, numMerges: Int, minCount: Long = 2L,
      batch: Int = 1, resume: Seq[(String, String)] = Nil): Seq[(String, String)] = {
    import docs.sparkSession.implicits._
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val replay = resume // stable local for the closure
    var words = {
      val wc = wordCounts(docs)
      if (replay.isEmpty) wc
      else wc.map(w => BpeWord(
        replay.foldLeft(w.syms) { case (s, (a, b)) => mergePair(s, a, b) }, w.n))
    }.persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // ONE job per round: the top-pair agg below is also what
    // materializes the current words cache, so the predecessor's
    // release is DEFERRED one iteration (unpersisting it before the
    // agg ran would recompute the whole merge chain). Eager per-merge
    // count() jobs cost a second driver round-trip per merge —
    // measured ~2× the whole training wall at small merge counts.
    var pendingRelease: Option[Dataset[BpeWord]] = None
    var iter = 0
    var checkpointRounds = 0
    while (iter < numMerges) {
      val want = math.min(batch, numMerges - iter)
      // over-fetch 4× when batching: overlapping candidates are
      // skipped, and a thin fetch would silently shrink the batch.
      // Bounded driver rows either way (≤ 4·batch, never data).
      val top = words.toDF("syms", "n")
        .select(
          col("n"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("n")).as("c"))
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(if (want == 1) 1 else want * 4)
        .collect()
      pendingRelease.foreach(_.unpersist())
      pendingRelease = None
      if (top.isEmpty) iter = numMerges
      else {
        // greedy token-disjoint acceptance in ranked order; the top
        // pair is always accepted, so every round makes progress
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val used = scala.collection.mutable.Set.empty[String]
        var r = 0
        while (r < top.length && accepted.length < want) {
          val (a, b) = (top(r).getString(0), top(r).getString(1))
          if (!used(a) && !used(b)) {
            accepted += ((a, b))
            used += a; used += b; used += (a + b)
          }
          r += 1
        }
        merges ++= accepted
        iter += accepted.length
        val acc = accepted.toSeq // stable local for the closure
        val prev = words
        val mapped = prev.map(w => BpeWord(
          acc.foldLeft(w.syms) { case (s, (a, b)) => mergePair(s, a, b) }, w.n)).persist()
        // every 8th round: cut lineage (localCheckpoint is eager — its
        // job materializes `mapped`, so the pre-checkpoint cache AND
        // prev can release immediately), else defer prev's release to
        // the next round's agg
        checkpointRounds += 1
        if (checkpointRounds % 8 == 0) {
          val cp = mapped.localCheckpoint()
          mapped.unpersist()
          prev.unpersist()
          words = cp
        } else {
          words = mapped
          pendingRelease = Some(prev)
        }
      }
    }
    pendingRelease.foreach(_.unpersist())
    words.unpersist()
    replay ++ merges.toSeq
  }

  /** Apply a learned merge table to one word (driver- or executor-side;
    * used by [[tokenize]]'s Dataset.map).
    */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft[Seq[String]](word.map(_.toString) :+ "</w>") {
      case (syms, (a, b)) => mergePair(syms, a, b)
    }

  /** Leftmost-first merge with per-position dropout: a matching (a, b)
    * at symbol index i merges only when `keep(i)` — the
    * [[mergePair]] scan otherwise (a dropped position's `a` is
    * re-eligible as the RIGHT side of the next match, exactly like a
    * non-match).
    */
  private[ops] def mergePairDropout(
      syms: Seq[String], a: String, b: String, keep: Int => Boolean): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b && keep(i)) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** BPE-dropout encoding (Provilkov et al. 2020): apply the learned
    * merge table but SKIP each individual merge application with
    * probability `p` — the BPE family's subword regularization, the
    * counterpart of [[UnigramLmOps.sampleTokenize]]'s α-lattice draws.
    * Each (merge index, symbol position) gets one md5-dyadic uniform
    * from `u`, so encoding is a pure function of (word, merges, p,
    * key-context): p = 0 is exactly [[encodeWord]] (spec-pinned),
    * p = 1 never merges (character + `</w>` fallback), in between each
    * epoch sees a different, coarser-to-finer rendering of the word.
    */
  def encodeWordDropout(
      word: String, merges: Seq[(String, String)], p: Double,
      u: (Int, Int) => Double): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString) :+ "</w>"
    var mi = 0
    while (mi < merges.length) {
      val (a, b) = merges(mi)
      val m = mi // stable for the closure
      syms = mergePairDropout(syms, a, b, i => u(m, i) >= p)
      mi += 1
    }
    syms
  }

  /** Corpus-level BPE-dropout tokenization — [[tokenize]]'s schema with
    * every merge application dropped at rate `p`, keyed by `seed` (the
    * epoch number): seed-replayable, epoch-diverse, partition-invariant
    * (all draws are row-local md5 of (seed, doc, word, merge, pos)).
    */
  def tokenizeDropout(
      docs: DataFrame, merges: Seq[(String, String)], p: Double, seed: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val m = merges
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, text.split(" ").filter(_.nonEmpty).toSeq.zipWithIndex.flatMap {
          case (w, wi) => encodeWordDropout(w, m, p,
            (mi, i) => PqOps.md5Dyadic(s"bd:$seed:$id:$wi:$mi:$i") + 0.5)
        })
      }
      .toDF("doc_id", "tokens")
  }

  /** Word-indexed BPE application — [[tokenize]]'s pieces under the
    * (doc_id, word_idx, pos, piece) schema the composed-export oracle
    * scheme consumes (`pos` is the piece position WITHIN the word, the
    * [[UnigramLmOps.tokenize]] shape). Pieces keep the `</w>` marker:
    * a word's pieces concatenate to `word + "</w>"` exactly. */
  def tokenizeWordIndexed(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    val m = merges // stable local for the closure
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split(" ").iterator.filter(_.nonEmpty).zipWithIndex.flatMap {
          case (w, wi) => encodeWord(w, m).iterator.zipWithIndex.map {
            case (p, pi) => (id, wi.toLong, pi.toLong, p)
          }
        }
      }
      .toDF("doc_id", "word_idx", "pos", "piece")
  }

  /** Tokenize a corpus with a learned merge table: (doc_id, tokens). */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    val m = merges // stable local for the closure
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, text.split(" ").filter(_.nonEmpty).toSeq.flatMap(w => encodeWord(w, m)))
      }
      .toDF("doc_id", "tokens")
  }

  val all: Seq[QueryDef] = Seq(

    // Trained-BPE application with dropout regularization, end to end
    // in one query: learn the merge table from the corpus (the driver
    // merge loop runs over the vocabulary-sized word table — 10
    // bounded jobs, never corpus passes), render one p=0.2 epoch, and
    // oracle-check via the OracleDump reconstruction scheme — the
    // token stream is the dump, and DuckDB independently re-verifies
    // that every doc's tokens concatenate back to its
    // whitespace-canonical text (a rendering inconsistent with the
    // corpus cannot hash-match, whatever the draws were). Spark
    // computes the same aggregates from its in-memory rendering.
    QueryDef(
      "q_bpe_dropout",
      s"""WITH seg AS (SELECT * FROM read_parquet('${OracleDump.path("bpe_dropout_tokens")}')),
        |rebuilt AS (
        |  SELECT doc_id, string_agg(token, '' ORDER BY pos) AS joined,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN token LIKE '%</w>' THEN 1 ELSE 0 END) AS BIGINT) AS n_words
        |  FROM seg GROUP BY doc_id),
        |canon AS (
        |  SELECT doc_id,
        |    array_to_string(list_filter(string_split(text, ' '), x -> len(x) > 0), ' ') AS ct
        |  FROM documents)
        |SELECT c.doc_id, r.n_tokens, r.n_words,
        |  CAST(CASE WHEN rtrim(replace(r.joined, '</w>', ' ')) = c.ct
        |       THEN 1 ELSE 0 END AS BIGINT) AS reconstructed
        |FROM canon c JOIN rebuilt r USING (doc_id)
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // batched selection (2 counting jobs instead of 6) + per-session
      // memo — the merge table is a plain driver value, so the dump
      // and the aggregates below always derive from one training
      val merges = TrainedCache.getOrTrain("bpe_merges_b6_n6", d)(
        learnMerges(docs, numMerges = 6, minCount = 2, batch = 6))
      val seg = tokenizeDropout(docs, merges, p = 0.2, seed = 1L)
        .select(col("doc_id"), posexplode(col("tokens")).as(Seq("pos", "token")))
        .withColumn("pos", col("pos").cast(LongType))
      OracleDump.write(seg, d, "bpe_dropout_tokens")
      val rebuilt = seg.groupBy("doc_id").agg(
        concat_ws("", sort_array(collect_list(struct(col("pos"), col("token"))))
          .getField("token")).as("joined"),
        count(lit(1)).cast(LongType).as("n_tokens"),
        sum(when(col("token").endsWith("</w>"), 1L).otherwise(0L))
          .cast(LongType).as("n_words"))
      val canon = docs.select(col("doc_id"),
        concat_ws(" ", filter(split(col("text"), " "), t => length(t) > 0)).as("ct"))
      canon.join(rebuilt, Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens"), col("n_words"),
          when(rtrim(regexp_replace(col("joined"), "</w>", " ")) === col("ct"), 1L)
            .otherwise(0L).cast(LongType).as("reconstructed"))
        .orderBy("doc_id")
    })
}
