package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.DedupOps

/** Persisted incremental near-duplicate index: the batch MinHash+LSH
  * pipeline ([[DedupOps]]) turned into a GROWING corpus gate. At 100 TB
  * you never re-minhash the whole corpus per ingest — each increment is
  * signed once, PROBED against the stored band table, and the survivors'
  * bands are appended; cost is O(increment + matched buckets), never
  * O(corpus).
  *
  * The index is a [[TxTable]] partitioned by band_id with rows
  * (band_id, band_hash, doc_id, sig): self-contained — matching uses the
  * stored k-long signature (estimated Jaccard = fraction of agreeing
  * positions, the [[graft.streaming.StreamingDedup]] estimator), so the
  * original text never needs to be fetched again (it may be gone). The
  * k-long payload rides each of the k/rowsPerBand band rows — a bounded
  * constant (~2 KB/doc at k=32), the price of probe-side self-containment.
  *
  * Each ingest commits through [[TxTable.appendCommit]]: a crash
  * mid-ingest leaves the previous index version intact (verdicts are
  * derived from data, so re-running the failed ingest is idempotent —
  * its dups resolve identically and its survivors append once).
  * Concurrent ingests of DISJOINT increments are safe at the storage
  * layer (blind appends never conflict) but the GATE is
  * last-writer-blind: two simultaneous ingests cannot see each other's
  * survivors, so near-dups ACROSS concurrently-ingested increments pass
  * through — serialize ingests when that matters (single-writer, the
  * same contract as the reference's hourly DAG).
  *
  * Within-increment semantics are GREEDY FIRST-WIN (the
  * [[graft.ops.SemDedupOps]] rule): a doc is dropped when the index
  * matches, or when ANY earlier (lower-id) increment-mate matches —
  * `dup_of` may therefore name a doc that was itself dropped
  * (attribution chains). The sequential one-at-a-time semantics of the
  * streaming gate would make each verdict depend on the previous doc's
  * verdict — an inherently serial scan the streaming tier provides
  * ([[graft.streaming.StreamingDedup.nearDupVerdicts]]); batch ingest
  * trades that for one parallel pass.
  *
  * Bucket skew: stored buckets are capped at `maxBucket` rows — an
  * oversized (boilerplate) bucket still matches probes against its
  * stored rows but stops admitting new ones, bounding both state and
  * probe fan-out at any scale. Admission order within one ingest is the
  * bucket-seeded hash of [[DedupOps.minhashNearDups]] (no systematic
  * high-id recall bias). The per-ingest bucket-count pass scans only
  * the buckets the increment touches (semi-join pruned); a production
  * deployment would keep a bucket-stats sidecar table instead.
  */
object DedupIndex {

  /** `n`/`k`/`rowsPerBand` are GEOMETRY (pinned at index creation);
    * `threshold`/`maxBucket` are per-ingest semantics knobs. The last
    * three tune the PROBE's scan regime only — any values produce
    * bit-identical verdicts (spec-pinned), they just move the
    * IO/pruning trade:
    *  - `probeScanBytesMin`: below this live-index size the probe
    *    stays the single-pass bloom scan (the full-width read is
    *    already cheap, and the two-phase plan's extra driver job
    *    would only add latency — the q_pretrain_export_incr job-count
    *    lesson, SCALE.md §16c); above it the stats-pruned two-phase
    *    probe engages.
    *  - `maxPointBuckets`: the largest driver-collected band_hash
    *    point set the pushed In-predicate accepts; beyond it the
    *    probe falls back to the bloom scan (a matched set that large
    *    means the scan IS O(matched) there, and it also bounds the
    *    parquet-side OR-of-eq tree depth).
    */
  final case class Params(
      n: Int = 3,
      k: Int = 32,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      maxBucket: Int = 64,
      probeScanBytesMin: Long = 512L * 1024 * 1024,
      maxPointBuckets: Int = 4096)

  /** (band_id, band_hash, doc_id, sig) rows for every doc with at least
    * one shingle. Docs shorter than n words shingle to ONE all-tokens
    * shingle (the [[DedupOps.shingles]] convention), which makes their
    * matching effectively exact-text; the size guard mirrors the batch
    * pipeline and only drops degenerate empties.
    */
  def bandRows(docs: DataFrame, p: Params): DataFrame = {
    val sh = docs
      .select(col("doc_id"), DedupOps.shingles(col("text"), p.n).as("sh"))
      .filter(size(col("sh")) > 0)
    sh.select(col("doc_id"), DedupOps.minhashSignature(col("sh"), p.k).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(DedupOps.bands(col("sig"), p.k, p.rowsPerBand)).as("b"))
      .select(
        col("b.band_id").as("band_id"), col("b.band_hash").as("band_hash"),
        col("doc_id"), col("sig"))
  }

  /** Estimated Jaccard between two stored signatures: fraction of
    * agreeing positions. Exact rational m/k — binary-exact for the
    * power-of-two k defaults, so no rounding is needed for determinism.
    */
  private def estJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m)).cast(DoubleType) /
      size(a).cast(DoubleType)

  /** Index-side prefilter: drop stored band rows whose bucket the
    * increment never touches, BEFORE the probe join shuffles anything —
    * without it the join reshuffles the ENTIRE index every ingest,
    * which is O(index), not the O(increment + matched buckets) this
    * module promises. Two regimes, picked by a bounded probe (the
    * [[graft.streaming.StreamingEnrich]] pattern): few distinct
    * increment buckets → isin literal list (exact); many → one
    * distributed bloom over the increment's bucket keys + a codegen'd
    * might_contain on the stored side (a SUPERSET — false positives
    * are cleared by the exact equi-join that still runs). Both regimes
    * leave verdicts bit-identical. The index SCAN remains O(index) —
    * the shuffle is what this kills; a stored layout sorted by
    * band_hash would let stats prune the scan too.
    */
  private[pipeline] def prefilterIndex(idx: DataFrame, newBands: DataFrame,
      maxInListBuckets: Int = 1024, fpp: Double = 0.01,
      bandRowBound: Long = -1L): DataFrame = {
    val bucketKey = xxhash64(col("band_id"), col("band_hash"))
    val buckets = newBands.select(bucketKey.as("bk")).distinct()
    // bandRowBound (the increment's band-row count, known free from the
    // ingest materialization) bounds the distinct buckets from above —
    // lets filterToKeySet skip its regime-probe job for any real-sized
    // increment (the probe only ever mattered for tiny batches)
    graft.ops.BloomOps.filterToKeySet(idx, bucketKey, buckets, maxInListBuckets, fpp,
      keyRowBound = bandRowBound)
  }

  /** Coalesce a SORTED distinct point set into at most `maxRanges`
    * inclusive [lo, hi] ranges covering every point: keep the
    * (maxRanges - 1) LARGEST gaps between consecutive points as range
    * splits, so the ranges hug the points and the spurious coverage
    * (gap interiors a pushed range predicate also admits) is the
    * minimum possible for that range budget. Driver-side, O(n log n).
    *
    * NOT on the probe's hot path (r15, measured via ProbeAbSoak): a
    * fresh OR-of-ranges Column per ingest recompiles superlinearly in
    * the leaf count (14 s first-eval at 96 leaves, paid per consumer
    * per batch) — the probe pushes an In point set instead, whose
    * InSet form compiles once per JVM. Kept as the range toolkit for
    * stable (compile-once) predicates and for the A/B instrument.
    */
  private[pipeline] def coalesceRanges(
      sortedPoints: Array[Long], maxRanges: Int): Seq[(Long, Long)] = {
    require(maxRanges >= 1, s"maxRanges must be >= 1, got $maxRanges")
    val n = sortedPoints.length
    if (n == 0) return Seq.empty
    if (n <= maxRanges) return sortedPoints.map(p => (p, p)).toSeq
    // gap i sits between points i and i+1; split at the largest ones.
    // Gap widths as unsigned-safe Longs: points are sorted, so the
    // difference never overflows (both fit in [Long.Min, Long.Max] and
    // hi >= lo), except hi - lo may exceed Long.MaxValue for extreme
    // spreads — compare via java.lang.Long.compareUnsigned on the raw
    // difference, which is exact for hi >= lo.
    val splits = (0 until n - 1)
      .sortBy(i => sortedPoints(i + 1) - sortedPoints(i))(
        Ordering.fromLessThan[Long]((a, b) => java.lang.Long.compareUnsigned(a, b) > 0))
      .take(maxRanges - 1)
      .sorted
    val bounds = (-1 +: splits :+ (n - 1)).distinct.sorted
    bounds.sliding(2).map { case Seq(a, b) =>
      (sortedPoints(a + 1), sortedPoints(b))
    }.toSeq
  }

  /** A balanced OR-tree of inclusive range predicates over `c` — the
    * stats-prunable probe filter: Catalyst translates the Or/And/
    * comparison tree to a parquet filter, and on the band_hash-
    * clustered leveled layout each narrow range prunes to the row
    * groups whose footer min/max it straddles. Balanced (not a linear
    * fold) so 256 leaves cost depth 8, keeping both the analyzer and
    * the generated row-level code shallow. Empty ranges = `false`
    * (reads nothing).
    */
  private[pipeline] def rangePredicate(
      c: org.apache.spark.sql.Column, ranges: Seq[(Long, Long)]): org.apache.spark.sql.Column = {
    def build(rs: Seq[(Long, Long)]): org.apache.spark.sql.Column = rs match {
      case Seq((lo, hi)) => if (lo == hi) c === lit(lo) else c >= lit(lo) && c <= lit(hi)
      case _ =>
        val (l, r) = rs.splitAt(rs.length / 2)
        build(l) || build(r)
    }
    if (ranges.isEmpty) lit(false) else build(ranges)
  }

  /** Probe-session cache: one config clone per parent session, holding
    * the raised parquet In-pushdown threshold the pruned probe needs
    * (default 10 would collapse a 100-point predicate to a useless
    * [min, max] range at the parquet layer). Session-scoped so the
    * caller's own queries NEVER see the raised threshold — their plan
    * fingerprints must not move — while frames built here compose with
    * caller-session frames zero-copy (the loopSession precedent: a
    * HadoopFsRelation carries its creating session, so the pushdown
    * translation reads THIS session's conf at every later evaluation,
    * whichever session runs the action). */
  private val probeSessionCache = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, SparkSession]()

  private def probeSession(spark: SparkSession): SparkSession =
    probeSessionCache.computeIfAbsent(spark, { parent =>
      val s = parent.newSession()
      parent.conf.getAll.foreach { case (k, v) =>
        try s.conf.set(k, v)
        catch { case scala.util.control.NonFatal(_) => () }
      }
      s.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", (1 << 20).toString)
      s
    })

  /** The r15 two-phase STATS-PRUNED probe view — the fix for the r14
    * weak mark ("the index SCAN remains O(index) per ingest", the old
    * comment in [[prefilterIndex]]): instead of reading the full
    * stored band table (all columns, including the ~k·8-byte sig
    * payload on every row) and filtering it row-by-row, resolve the
    * increment's matched band_hash POINT SET first and re-read the
    * index under a pushed `band_hash IN (points)` predicate. Parquet
    * evaluates the pushed In as OR-of-eq against footer min/max on the
    * band_hash-clustered leveled layout ([[compact]] clusters runs on
    * band_hash within band_id exactly so this probe can exist), so
    * full-width IO — the sig pages are ~90% of the table's bytes — is
    * O(matched row groups), not O(index). Level-0 append runs are
    * unsorted and read in full; they are bounded by the maintenance
    * cadence, never by the corpus.
    *
    * WHY In-points and not OR-of-ranges (measured, ProbeAbSoak r15):
    * a fresh OR-of-N-ranges Column per ingest is new generated source
    * per batch, and whole-stage compile cost is superlinear in the
    * leaf count — first evaluation measured 0.33 s at 8 leaves, 1.1 s
    * at 16, 4.2 s at 32, 14 s at 96 — paid PER CONSUMER PER BATCH
    * (~42 s/ingest at 96 matched buckets, 5× the old full scan: the
    * cure was worse than the disease). The In form optimizes to
    * `InSet`, whose generated source is stable across batches (values
    * live in the references array, not the source text), so janino
    * compiles once per JVM; the parquet-side OR-of-eq FilterPredicate
    * is plain object construction. The actual IO was never the
    * problem — a cold stats-pruned read of this table measured
    * sub-second against 14–19 s first-evaluation compile walls.
    *
    * Point-set resolution, by increment size:
    *  - increment's distinct buckets <= maxPointBuckets: the points
    *    are the increment's OWN band hashes (one increment-sized
    *    distinct+collect, NO index pass at all — the routine-ingest
    *    fast path: true O(matched) probe IO);
    *  - larger increments: one NARROW pass over the index reading ONLY
    *    (band_id, band_hash) — columnar projection leaves the sig
    *    pages untouched; measured 0.2 s where the full-width read paid
    *    seconds — bloom-prefiltered and exact-semi-joined down to the
    *    STORED ∩ increment (matched) keys, collected if they fit.
    *    This leaves one corpus-linear term: the narrow key-column
    *    read (~8-10 B/row — at the 100 TB framing, the band-key
    *    columns of a 10^10-doc index are ~2 TB across the cluster,
    *    seconds of scan; the honest floor for a uniformly-hashed key
    *    set, where no stats layout can prune a corpus-spread probe
    *    below its key column).
    *  - matched set still larger than maxPointBuckets (dup-heavy
    *    increment, e.g. a full replay): fall back to
    *    [[prefilterIndex]]'s single bloom scan — matched is a large
    *    fraction of the index there, so the full scan IS O(matched).
    *
    * The pruned view is lazily checkpointed: it is small by
    * construction (matched buckets × the [[Params.maxBucket]] cap),
    * and [[ingestFull]] drives three consumers over it — without the
    * cut each would re-run the probe scan. On the In path the view is
    * EXACTLY the matched buckets' stored rows (cross-band hash
    * coincidences ride along; the bloom fallback stays a superset) —
    * every consumer re-joins on the exact keys either way, so
    * verdicts are bit-identical across all regimes (spec-pinned).
    */
  private[pipeline] def probeIndexPruned(spark: SparkSession, root: String,
      newBands: DataFrame, bandRowBound: Long, p: Params,
      cut: Boolean = true): DataFrame = {
    val points: Option[Array[Long]] =
      if (bandRowBound >= 0 && bandRowBound <= p.maxPointBuckets) {
        // tiny increment: its band-row bound already caps the distinct
        // bucket count — collect its own hashes, skip the index pass
        Some(newBands.select(col("band_hash")).distinct()
          .collect().map(_.getLong(0)))
      } else {
        val bucketKey = xxhash64(col("band_id"), col("band_hash"))
        val buckets = newBands.select(bucketKey.as("bk")).distinct()
        val narrow = TxTable.read(spark, root).select(col("band_id"), col("band_hash"))
        // bloom kills the shuffle (only ~matched + fpp·index rows move),
        // the exact semi-join kills the bloom's false positives
        val matched = graft.ops.BloomOps
          .filterToKeySet(narrow, bucketKey, buckets, keyRowBound = bandRowBound)
          .join(buckets, xxhash64(col("band_id"), col("band_hash")) === col("bk"), "leftsemi")
          .select(col("band_hash")).distinct()
        val pts = matched.limit(p.maxPointBuckets + 1).collect().map(_.getLong(0))
        if (pts.length <= p.maxPointBuckets) Some(pts) else None
      }
    points match {
      case Some(pts) if pts.isEmpty =>
        // nothing matched (and the narrow pass PROVED it): an explicit
        // false folds to an empty relation — In(attr, Nil) would not,
        // and its unpushable scan would read the table to drop it all
        TxTable.read(spark, root).filter(lit(false))
      case Some(pts) =>
        val pruned = TxTable.read(probeSession(spark), root)
          .filter(col("band_hash").isin(pts.toSeq: _*))
        // `cut = false` is spec-only: the checkpoint wraps the plan as
        // a LogicalRDD, hiding the pushed-filter evidence a plan
        // assertion needs
        if (cut) pruned.localCheckpoint(false) else pruned
      case None =>
        prefilterIndex(TxTable.read(spark, root), newBands, bandRowBound = bandRowBound)
    }
  }

  /** Cap admission: within each (band_id, band_hash) bucket, admit new
    * rows only while existing + rank <= maxBucket, ranked by the
    * bucket-seeded hash (deterministic, no high-id bias).
    */
  private[pipeline] def admitWithCap(
      newBands: DataFrame, bucketCounts: Option[DataFrame], maxBucket: Int): DataFrame = {
    val w = Window.partitionBy("band_id", "band_hash")
      .orderBy(xxhash64(col("band_hash"), col("doc_id")), col("doc_id"))
    // bucketCounts = None ⇔ the index is empty (first ingest): every
    // bucket's existing count is zero, so the stored-count join is
    // dropped from the plan instead of joining an empty frame
    val withExisting = bucketCounts match {
      case Some(bc) => newBands
        .join(bc, Seq("band_id", "band_hash"), "left")
        .withColumn("_existing", coalesce(col("cnt"), lit(0L)))
      case None => newBands.withColumn("_existing", lit(0L))
    }
    withExisting
      .withColumn("_rk", row_number().over(w))
      .filter(col("_existing") + col("_rk") <= maxBucket)
      .select(newBands.columns.map(col).toSeq: _*)
  }

  /** Index maintenance: merge the per-ingest append fragments into
    * bounded LEVELED runs ([[TxTable.compactLeveled]], r14 — the full
    * [[TxTable.compactAll]] rewrite was O(index) per firing, the same
    * scale-killer shape as the shard table's) and reclaim superseded
    * dirs. Runs are clustered on band_hash within each band_id
    * partition, so a future stats-pruned probe layout stays possible.
    * Contents are unchanged, but the vacuum DELETES superseded version
    * dirs: any still-unevaluated verdicts frame from an earlier
    * [[ingest]] (whose plan pins the pre-ingest dir list) must be
    * materialized first. Single-writer, like ingest itself. Returns
    * whether any merge step ran.
    *
    * `vacuum` defaults FALSE (r14): compact is reached from streaming
    * maintenance ([[PretrainExport.runAvailableNow]]'s maintain hook),
    * whose driver cannot know its readers' retention windows — an
    * unconditional vacuum there could FileNotFound a reader pinned on
    * a superseded version mid-scan. Batch callers that own the only
    * readers opt in (or schedule [[TxTable.vacuum]] themselves).
    */
  def compact(spark: SparkSession, root: String, vacuum: Boolean = false,
      minMergeLevel: Int = 0, maxMergeLevel: Int = Int.MaxValue): Boolean = {
    val steps = TxTable.compactLeveled(spark, root, "band_id", Seq("band_hash"),
      minMergeLevel = minMergeLevel, maxMergeLevel = maxMergeLevel)
    if (vacuum) TxTable.vacuum(spark, root)
    steps > 0
  }

  /** The index's band geometry is pinned at creation (`_graft_params`
    * beside the log): signatures and bucket layout are functions of
    * (n, k, rowsPerBand), so probing or appending with DIFFERENT
    * values silently mis-buckets — including the replay case, where a
    * params change between attempt and retry would defeat the
    * stored-doc anti-join (new buckets ≠ stored buckets) and duplicate
    * bands. Ingest therefore refuses a geometry mismatch loudly.
    */
  private def pinParams(spark: SparkSession, root: String, p: Params): Unit = {
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val path = new org.apache.hadoop.fs.Path(root, "_graft_params")
    val geometry = s"n=${p.n},k=${p.k},rowsPerBand=${p.rowsPerBand}"
    if (f.exists(path)) {
      val stored = PinFile.read(spark, path)
      require(stored == geometry,
        s"index at $root was built with [$stored]; ingest called with [$geometry] — " +
          "band geometry is immutable (rebuild the index to change it)")
    } else {
      // atomic publish: a crash mid-write must not leave a truncated
      // pin that every later ingest would mismatch against. A
      // concurrent winner is fine iff it pinned the same geometry.
      if (!PinFile.writeAtomic(spark, path, geometry)) {
        val stored = PinFile.read(spark, path)
        require(stored == geometry,
          s"index at $root was pinned concurrently with [$stored]; " +
            s"this ingest uses [$geometry] — band geometry is immutable")
      }
    }
  }

  /** Ingest an increment: gate every doc against the stored index AND
    * its earlier increment-mates, append the survivors' bands (one
    * atomic [[TxTable.appendCommit]]), and return per-doc verdicts
    * (doc_id, dup_of, est_jaccard, accepted) — dup_of/est_jaccard null
    * for accepted docs. Creating the index IS the first ingest on an
    * empty root.
    */
  def ingest(spark: SparkSession, root: String, newDocs: DataFrame,
      p: Params = Params()): DataFrame = ingestFull(spark, root, newDocs, p)._1

  /** [[ingest]] plus the bounded duplicate frame itself ((doc_id,
    * dup_of, est_jaccard), one row per REJECTED doc — the checkpointed
    * `best`): callers that only need "kept minus dups" (the export
    * chain) anti-join against this tiny frame directly instead of
    * re-deriving it from the verdicts' left join (which costs a
    * shuffle-join broadcast build the size of the increment). The
    * verdicts frame remains the per-doc API; both views are derived
    * from the same materialization.
    *
    * `precomputedBands`: band rows for EXACTLY `newDocs`, already
    * materialized by the caller (the [[PretrainExport.prepare]] path —
    * signing is per-doc deterministic and index-independent, so a
    * producer can sign a multi-batch corpus once and ingest slices).
    * The caller owns geometry consistency: the frame must be
    * [[bandRows]] output under THIS index's pinned params — the pin
    * check here still validates the params object, but cannot inspect
    * a foreign frame's provenance.
    */
  private[pipeline] def ingestFull(spark: SparkSession, root: String, newDocs: DataFrame,
      p: Params = Params(),
      precomputedBands: Option[DataFrame] = None,
      precomputedBandBound: Long = -1L): (DataFrame, DataFrame) = {
    pinParams(spark, root, p)
    // EAGER localCheckpoint, not lazy persist(): the first consumer of
    // a lazily-cached frame here is a self-JOIN, whose two shuffle-map
    // stages run CONCURRENTLY and race the cache — both compute the
    // full shingle+minhash+banding subtree before either's blocks
    // land (profiled: the kernel pass ran ~15× per ingest through the
    // assorted joins/broadcasts/counts). One materialization job up
    // front makes every consumer a block read. CLUSTER CAVEAT (the same
    // one the CC loops carry): localCheckpoint blocks are NON-reliable —
    // on a real cluster a lost executor after ingest makes later
    // evaluation of the returned verdicts THROW instead of recomputing
    // (the old persist() behavior), and blocks are only released by
    // driver GC. At fleet scale swap for a reliable checkpoint (or
    // persist + an explicit first-consumer barrier); callers holding
    // verdicts long-lived should copy them out promptly either way.
    // non-eager checkpoint + count as the materializing action: the cut
    // and the band-row count cost one job, and the count doubles as the
    // prefilter's regime bound below. A precomputed frame is already
    // backed by its producer's materialization — a lazy slice of cached
    // blocks, no signing compute and no second cut.
    val newBands = precomputedBands.getOrElse(bandRows(newDocs, p).localCheckpoint(false))
    // the count has two duties: materialize the fresh cut (above) and
    // bound the prefilter's regime probe. A precomputed frame is
    // already materialized, and the caller usually knows an UPPER
    // BOUND on its band rows for free (kept docs × bands/doc) —
    // regime choice is performance-only (filterToKeySet doc), so the
    // bound replaces the count job entirely on the prepared path.
    val nBandRows =
      if (precomputedBands.isDefined && precomputedBandBound >= 0L) precomputedBandBound
      else newBands.count()
    val hasIndex = TxTable.latest(spark, root)._1 > 0
    // every index consumer below (probe, bucket counts, replay
    // anti-join) works on a pruned view — the full index never reaches
    // a shuffle, and above probeScanBytesMin it never reaches a
    // full-width SCAN either ([[probeIndexPruned]], the r15 fix for
    // the O(index)-read-per-ingest weak mark). The size gate is one
    // driver-side fs stat; below it the single bloom scan stays (the
    // two-phase plan's extra job would only add driver latency to a
    // probe whose full read is already sub-second).
    val index = if (!hasIndex) None
    else if (TxTable.liveBytes(spark, root) < p.probeScanBytesMin)
      Some(prefilterIndex(TxTable.read(spark, root), newBands, bandRowBound = nBandRows))
    else Some(probeIndexPruned(spark, root, newBands, nBandRows, p))

    // probe: stored candidates sharing any bucket with a new doc. The
    // doc's OWN stored bands (a replayed ingest after a successful
    // append) are excluded — matching yourself would flip every
    // previously-accepted doc to dup_of=itself on retry; ids are
    // single-assignment (a DIFFERENT text reusing a stored id is the
    // caller's bug, not a duplicate).
    val indexCand = index.map { idx =>
      newBands.join(
        idx.select(
          col("band_id"), col("band_hash"),
          col("doc_id").as("cand"), col("sig").as("cand_sig")),
        Seq("band_id", "band_hash"))
        .filter(col("cand") =!= col("doc_id"))
        .select(col("doc_id"), col("cand"), col("sig"), col("cand_sig"))
        .dropDuplicates("doc_id", "cand")
    }
    // within-increment: earlier-id increment-mates sharing any bucket
    val earlier = newBands.select(
      col("band_id"), col("band_hash"), col("doc_id").as("cand"), col("sig").as("cand_sig"))
    val batchCand = newBands
      .join(earlier, Seq("band_id", "band_hash"))
      .filter(col("cand") < col("doc_id"))
      .select(col("doc_id"), col("cand"), col("sig"), col("cand_sig"))
      .dropDuplicates("doc_id", "cand")

    val cand = indexCand.map(_.unionByName(batchCand)).getOrElse(batchCand)
      .dropDuplicates("doc_id", "cand") // a doc re-ingested twice is its own index candidate
      .withColumn("est", estJaccard(col("sig"), col("cand_sig")))
      .filter(col("est") >= p.threshold)
    // best match: highest estimate, ties to the smallest candidate id
    // (the StreamingDedup rule). localCheckpoint: this is the apex of
    // the expensive subtree (bucket self-join + index probe +
    // signature compare + rank), and WITHOUT materialization every
    // downstream consumer — the verdict counts, the survivor-band
    // broadcast, the append itself, and the caller's lazy verdicts —
    // re-runs the whole thing (profiled: ~5 re-evaluations, the
    // dominant ingest cost at 50k docs). NON-eager (r14): every job
    // below references `best` exactly once (no intra-job double
    // evaluation to race the cache), so the survivor-band staging
    // write doubles as the materializing action and the dedicated
    // eager job disappears — per-job driver latency, not compute,
    // dominates increment-sized ingests. The frame is one row per
    // DUPLICATE doc, bounded by the increment, so the cut is cheap at
    // any scale.
    val w = Window.partitionBy("doc_id").orderBy(col("est").desc, col("cand"))
    val best = cand
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("cand").as("dup_of"), col("est").as("est_jaccard"))
      .localCheckpoint(false)

    val verdicts = newDocs.select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .withColumn("accepted", col("dup_of").isNull)

    // append survivors' bands, bucket-capped, in ONE atomic commit —
    // minus docs ALREADY stored (the replayed-ingest case: their
    // verdicts recompute identically above, and re-appending their
    // bands would duplicate index rows), making retry a true no-op.
    // The PREFILTERED index suffices for this anti-join: a replayed
    // doc's stored bands are by definition the increment's own buckets,
    // so the prefilter always keeps them. Survivors are subtracted as
    // newBands MINUS the duplicate set (an anti-join whose build side
    // is the bounded `best` frame) rather than a semi-join against the
    // accepted verdicts, whose build side would be the whole increment.
    val survivorBands = index.foldLeft(
      newBands.join(best.select("doc_id"), Seq("doc_id"), "left_anti")) {
      (bands, idx) => bands.join(idx.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    }
    val bucketCounts = index.map { idx =>
      idx.join(newBands.select("band_id", "band_hash").distinct(),
        Seq("band_id", "band_hash"), "leftsemi")
        .groupBy("band_id", "band_hash").agg(count(lit(1)).as("cnt"))
    }
    // ONE job commits the survivors: stage the admitted bands directly
    // and publish only if any partition landed (appendCommitNonEmpty) —
    // the former cut + count + write evaluated the cap window twice and
    // paid an extra job for the emptiness probe; the staging write is
    // now the single evaluation AND the materializing action of the
    // non-eager `best` cut above.
    val admitted = admitWithCap(survivorBands, bucketCounts, p.maxBucket)
    TxTable.appendCommitNonEmpty(spark, root, admitted, "band_id")
    // (newBands/admitted checkpoint blocks are reclaimed by the
    // ContextCleaner once this frame's references drop; the returned
    // verdicts only reference the checkpointed `best`)
    // Safe to return lazily: TxTable.read resolved the index's dir list
    // when the manifest was parsed ABOVE, so a caller evaluating the
    // verdicts after the append (or after later ingests) still compares
    // against exactly the pre-ingest index — deterministic, never
    // self-matching.
    (verdicts, best)
  }
}
