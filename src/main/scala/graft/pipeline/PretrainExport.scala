package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{PretrainExportOps, UnigramLmOps}

/** INCREMENTAL pretraining export — the composed flagship chain
  * (quality → near-dup dedup → pinned-tokenizer rendering → packed
  * offsets → striped shards) as a GROWING pipeline. The reference's
  * defining processing model is incremental (watermark + merge,
  * `stg_readings.sql:32-38` re-reads only new partitions); this module
  * applies that model to the training-data chain: a new document batch
  * is quality-gated, probed against the persisted [[DedupIndex]]
  * (O(increment + matched buckets), never O(corpus)), rendered with
  * the PINNED [[TokenizerStore]] version (bit-exact reload), packed
  * with offsets CONTINUING from the stored token/row totals, and
  * appended to the shard table in one atomic [[TxTable]] commit —
  * never re-deriving the existing corpus.
  *
  * Layout under `root/`:
  *   - `dedup/`     — [[DedupIndex]] band table (its own pinned geometry)
  *   - `tokenizer/` — [[TokenizerStore]] unigram versions
  *   - `shards/`    — TxTable of packed rows (doc_id, n_words,
  *     n_tokens, n_rec, start_off, window_id, off_in_window),
  *     PARTITIONED BY shard (stripe id)
  *   - `_graft_export_params` — budget / stripe count / maxLen /
  *     pinned tokenizer version, written once at [[init]] and refused
  *     on mismatch (the [[DedupIndex]] geometry-pinning discipline:
  *     a different budget or vocabulary is a DIFFERENT export).
  *
  * Tokenizer pinning: [[init]] trains once and pins that store
  * version for the export's whole life — every append renders with
  * [[TokenizerStore.loadUnigramAt]] at the pinned version, so rows
  * packed a year apart carry the same vocabulary (mixed-vocabulary
  * shard tables are silently corrupt training data).
  * [[refreshTokenizer]] is the upgrade path: warm-start retraining
  * ([[UnigramLmOps.train]]'s `resume` — stored pieces keep their mass,
  * new characters enter at the floor) commits version N+1 for FUTURE
  * exports to pin; THIS export's renderings are unchanged by
  * construction.
  *
  * Equivalence contract (spec-pinned): with batches arriving in
  * doc_id order (append-only ids — the reference's monotone ingest
  * key) and duplicate pairs not straddling [[DedupIndex]]'s greedy
  * semantics edges, incremental appends produce EXACTLY the shard
  * table of a single one-shot append of the union — same rows, same
  * offsets, same stripe assignment, same checksums.
  *
  * Replay idempotence: each stage is individually replay-safe
  * (DedupIndex re-ingest re-derives identical verdicts and appends no
  * bands; the shard append anti-joins stored doc_ids), so a crash
  * BETWEEN the dedup commit and the shard commit converges on replay —
  * re-running the same append finishes the missing half and a second
  * replay is a pure no-op.
  *
  * 100 TB shape: every stage is its operator's proven scale path —
  * map-shaped quality scan, bucket-prefiltered index probe, broadcast
  * vocab rendering, bucketed prefix sums with O(1) driver base
  * counters (one bounded aggregate over the stored table), one hash
  * exchange on the stripe id per append.
  */
object PretrainExport {

  final case class Params(
      windowBudget: Long = 256L,
      stripeShards: Long = 8L,
      maxLen: Int = 4,
      dedup: DedupIndex.Params = DedupIndex.Params())

  final case class AppendStats(
      docsIn: Long, qualityKept: Long, accepted: Long, appended: Long)

  private def dedupRoot(root: String) = s"$root/dedup"
  private def tokRoot(root: String) = s"$root/tokenizer"
  private def shardsRoot(root: String) = s"$root/shards"

  /** Pinned parameters beside the tables — written once at init,
    * mismatches refused loudly (the DedupIndex pinParams discipline). */
  private def paramsPath(root: String) =
    new org.apache.hadoop.fs.Path(root, "_graft_export_params")

  private def writeParams(
      spark: SparkSession, root: String, p: Params, tokVersion: Long): Unit = {
    val path = paramsPath(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(path),
      s"export at $root is already initialized (params are immutable — " +
        "a different budget/stripe/vocabulary is a new export)")
    // the dedup geometry is part of the pinned identity: append
    // reconstructs Params from THIS file, so an unserialized field
    // would silently revert every append to default band geometry
    val content = s"budget=${p.windowBudget},stripes=${p.stripeShards}," +
      s"maxLen=${p.maxLen},tokVersion=$tokVersion," +
      s"dedupN=${p.dedup.n},dedupK=${p.dedup.k}," +
      s"dedupRowsPerBand=${p.dedup.rowsPerBand}," +
      s"dedupThreshold=${p.dedup.threshold},dedupMaxBucket=${p.dedup.maxBucket}"
    require(PinFile.writeAtomic(spark, path, content),
      s"export at $root was initialized concurrently (params are immutable)")
  }

  private[pipeline] def readParams(
      spark: SparkSession, root: String): (Params, Long) = {
    val path = paramsPath(root)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path), s"export at $root is not initialized — call init first")
    val kv = PinFile.readKv(spark, path)
    val dd = DedupIndex.Params() // defaults only for pre-r12 pins, which never carried geometry
    val dedup = DedupIndex.Params(
      n = kv.get("dedupN").map(_.toInt).getOrElse(dd.n),
      k = kv.get("dedupK").map(_.toInt).getOrElse(dd.k),
      rowsPerBand = kv.get("dedupRowsPerBand").map(_.toInt).getOrElse(dd.rowsPerBand),
      threshold = kv.get("dedupThreshold").map(_.toDouble).getOrElse(dd.threshold),
      maxBucket = kv.get("dedupMaxBucket").map(_.toInt).getOrElse(dd.maxBucket))
    (Params(kv("budget").toLong, kv("stripes").toLong, kv("maxLen").toInt, dedup),
      kv("tokVersion").toLong)
  }

  /** Create the export: train the tokenizer on `tokenizerCorpus` (the
    * seed corpus — the vocabulary an export ships with is a training
    * decision made once, up front), commit it as store version 1, and
    * pin that version. Returns the pinned version. No documents are
    * ingested — [[append]] is the only ingest path, so the one-shot
    * twin of N appends is literally one append of the union. */
  def init(
      spark: SparkSession, root: String, tokenizerCorpus: DataFrame,
      p: Params = Params(), vocabSize: Int = 800, seedSize: Int = 2000,
      emIters: Int = 2, pruneFrac: Double = 0.5): Long = {
    val model = UnigramLmOps.train(tokenizerCorpus, vocabSize = vocabSize,
      maxLen = p.maxLen, seedSize = seedSize, emIters = emIters,
      pruneFrac = pruneFrac)._1
    initPinned(spark, root, model, p)
  }

  /** [[init]] with an ALREADY-trained model — the path for callers
    * that share one session-trained vocabulary across several exports
    * (or re-pin a model trained elsewhere): commit it as store
    * version 1 and pin. Same immutability contract as init. */
  def initPinned(
      spark: SparkSession, root: String, model: UnigramLmOps.UnigramModel,
      p: Params = Params()): Long = {
    TokenizerStore.saveUnigram(spark, tokRoot(root), model)
    val v = TxTable.latest(spark, tokRoot(root))._1
    writeParams(spark, root, p, v)
    v
  }

  /** The pinned model every append renders with (bit-exact reload at
    * the pinned version — later [[refreshTokenizer]] commits never
    * touch this export's renderings). */
  def pinnedModel(spark: SparkSession, root: String): UnigramLmOps.UnigramModel = {
    val (_, v) = readParams(spark, root)
    TokenizerStore.loadUnigramAt(spark, tokRoot(root), v)
  }

  /** Warm-start upgrade path: retrain from the LATEST stored model on
    * `corpus` ([[UnigramLmOps.train]] `resume` — the spec-pinned
    * identity when the model has converged and the alphabet is
    * unchanged), commit as version N+1, and return it. This export
    * keeps rendering at its pinned version; the new version is for the
    * NEXT export root to pin at its init. */
  def refreshTokenizer(
      spark: SparkSession, root: String, corpus: DataFrame,
      vocabSize: Int = 800, seedSize: Int = 2000, emIters: Int = 2,
      pruneFrac: Double = 0.5): Long = {
    val (p, _) = readParams(spark, root)
    val stored = TokenizerStore.loadUnigram(spark, tokRoot(root))
    val model = UnigramLmOps.train(corpus, vocabSize = vocabSize,
      maxLen = p.maxLen, seedSize = seedSize, emIters = emIters,
      pruneFrac = pruneFrac, resume = Some(stored))._1
    TokenizerStore.saveUnigram(spark, tokRoot(root), model)
    TxTable.latest(spark, tokRoot(root))._1
  }

  /** Ingest one batch: quality gate → [[DedupIndex.ingest]] (the
    * O(increment) probe) → anti-join stored shard rows (replay guard)
    * → pinned-vocab rendering → offset-continued pack + stripe → one
    * atomic shard append. */
  def append(spark: SparkSession, root: String, docs: DataFrame): AppendStats = {
    val (p, tokVersion) = readParams(spark, root)
    val model = TokenizerStore.loadUnigramAt(spark, tokRoot(root), tokVersion)
    val docsIn = docs.count()
    // eager cuts on the multi-consumer frames (the repo's discipline
    // for frames driven through several actions): kept feeds the index
    // ingest, the canon join, and its own count; canon feeds a count,
    // the anti-join, and (via novel) the min-id guard, the rendering,
    // and the per-doc stats. Without the cuts the quality scan and the
    // verdict join re-executed per action. Both frames are
    // increment-sized by contract.
    val kept = PretrainExportOps.qualityKept(docs).localCheckpoint(true)

    val verdicts = DedupIndex.ingest(spark, dedupRoot(root), kept, p.dedup)
    val canon = kept.join(
      verdicts.filter(col("accepted")).select("doc_id"), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val keptN = kept.count()
    val acceptedN = canon.count()

    val sRoot = shardsRoot(root)
    val hasShards = TxTable.latest(spark, sRoot)._1 > 0
    // base counters + replay guard from the STORED table (derived, not
    // a side counter that could desync across a crash): one bounded
    // aggregate — (sum tokens, row count, max id)
    val (tokenBase, rowBase, maxStored) =
      if (hasShards) {
        val r = TxTable.read(spark, sRoot)
          .agg(sum(col("n_tokens")), count(lit(1)), max(col("doc_id")))
          .collect()(0)
        (r.getLong(0), r.getLong(1), Some(r.getLong(2)))
      } else (0L, 0L, None)
    val novel =
      if (hasShards)
        // same eager-cut rationale: three consumers (min-id guard,
        // rendering, per-doc stats) would each re-run the anti-join
        // against the stored table
        canon.join(TxTable.read(spark, sRoot).select("doc_id"),
          Seq("doc_id"), "left_anti")
          .localCheckpoint(true)
      else canon
    // the append-only id contract the incremental ≡ one-shot
    // equivalence rests on — violations corrupt offset continuity, so
    // refuse loudly instead of silently interleaving
    maxStored.foreach { mx =>
      val minNew = novel.agg(min(col("doc_id"))).collect()(0)
      if (!minNew.isNullAt(0))
        require(minNew.getLong(0) > mx,
          s"append violates the append-only doc_id contract: new doc " +
            s"${minNew.getLong(0)} <= stored max $mx — batches must " +
            "arrive in id order (re-ingesting old ids is a replay, " +
            "which the anti-join above already absorbs)")
    }

    val seg = UnigramLmOps.tokenize(novel, model, maxLen = p.maxLen)
    val perDoc = PretrainExportOps.perDocStats(novel, seg, "")
    val rows = PretrainExportOps.packAndStripe(
      perDoc, p.windowBudget, p.stripeShards, tokenBase, rowBase)
    val cut = rows.localCheckpoint(false)
    val n = cut.count()
    if (n > 0) TxTable.appendCommit(spark, sRoot, cut, "shard")
    AppendStats(docsIn, keptN, acceptedN, n)
  }

  /** The packed shard table (all rows, all stripes). */
  def shardTable(spark: SparkSession, root: String): DataFrame =
    TxTable.read(spark, shardsRoot(root))
      .select(col("doc_id"), col("n_words"), col("n_tokens"), col("n_rec"),
        col("start_off"), col("window_id"), col("off_in_window"),
        col("shard").cast("long").as("shard"))

  /** The striped manifest over the CURRENT table — the same aggregate
    * the one-shot flagship query emits ([[PretrainExportOps.shardSummary]]),
    * so incremental state is checkable against the oracle-green shape. */
  def manifest(spark: SparkSession, root: String): DataFrame =
    PretrainExportOps.shardSummary(shardTable(spark, root))
}
