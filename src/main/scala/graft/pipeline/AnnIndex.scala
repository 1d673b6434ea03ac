package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{IvfOps, KMeans}

/** Persisted incremental IVF ANN index — the [[DedupIndex]] contract
  * applied to similarity search: at 100 TB you never re-train or
  * re-assign the whole corpus per ingest. Centroids are trained ONCE
  * at build (spherical k-means on the bounded driver sample,
  * [[KMeans.fitSample]]) and frozen; each increment is assigned to the
  * frozen centroids and appended; a query probes `nprobe` cells and
  * scans only their postings — grow cost O(increment), query cost
  * O(probed postings), never O(corpus).
  *
  * Two [[TxTable]]s under one root:
  *   - `root/centroids` — (cid, cemb), written once at build,
  *     IMMUTABLE (the frozen codebook; re-clustering is a new index,
  *     exactly like [[DedupIndex]]'s pinned band geometry). Bounded:
  *     nlist rows, collected driver-side per operation under the same
  *     guarantee that bounds k-means itself.
  *   - `root/postings` — (cluster, vec_id, emb, norm), PARTITIONED BY
  *     cluster, appended per increment. A probe reads only its cells'
  *     partitions (partition-pruned scan — the on-disk twin of the
  *     in-plan cell filter).
  *
  * Query is [[IvfOps.probeRank]] — the SAME operator `annTrained`
  * runs, by construction, so index answers equal the one-shot path
  * whenever centroids and postings match (spec-pinned).
  *
  * Idempotence: [[append]] anti-joins on vec_id against the stored
  * postings (column-pruned scan), so a crashed/replayed ingest never
  * duplicates a vector; each append is one atomic
  * [[TxTable.appendCommit]]. Same single-writer caveat as DedupIndex:
  * concurrent appends of disjoint increments are storage-safe, but
  * vec_id dedup across RACING appends is not guaranteed — serialize
  * ingests.
  *
  * Frozen-centroid drift is the documented trade (FAISS's own
  * contract): increments far from the training distribution land in
  * the nearest existing cells and recall degrades gracefully;
  * [[cellStats]] surfaces the imbalance a re-build decision needs.
  */
object AnnIndex {

  private def centroidsRoot(root: String) = s"$root/centroids"
  private def postingsRoot(root: String) = s"$root/postings"

  /** Train the frozen codebook on `emb` and commit both tables
    * (centroids; initial postings). Creating the index IS the first
    * append. */
  def build(
      spark: SparkSession, root: String, emb: DataFrame,
      nlist: Int, iters: Int = 5): Unit = {
    require(TxTable.latest(spark, centroidsRoot(root))._1 == 0,
      s"index already built at $root (centroids are frozen — a new clustering is a new index)")
    val model = KMeans.fitSample(
      IvfOps.unitEmb(emb), k = nlist, iters = iters, spherical = true)
    TxTable.commit(
      spark, centroidsRoot(root),
      // one partition value: the codebook is one bounded immutable blob
      KMeans.centroidDf(spark, model.centroids).withColumn("part", lit("all")),
      "part")
    appendAssigned(spark, root, emb, model.centroids)
    ()
  }

  /** Frozen codebook as the driver array assignment needs (bounded:
    * nlist × dim doubles — the same size k-means training held). */
  private def loadCentroids(spark: SparkSession, root: String): Array[Array[Double]] =
    TxTable.read(spark, centroidsRoot(root))
      .select(col("cid").cast(LongType).as("cid"), col("cemb"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)

  /** Assign an increment to the FROZEN centroids and append its novel
    * vectors (vec_id anti-join — replay-idempotent). Returns rows
    * appended. */
  def append(spark: SparkSession, root: String, emb: DataFrame): Long = {
    val cents = loadCentroids(spark, root)
    appendAssigned(spark, root, emb, cents)
  }

  private def appendAssigned(
      spark: SparkSession, root: String, emb: DataFrame,
      cents: Array[Array[Double]]): Long = {
    val base = IvfOps.withNorm(emb)
    val assigned = base.join(
      KMeans.assignClusters(IvfOps.unitEmb(emb), cents)
        .select(col("vec_id"), col("cluster").cast(LongType).as("cluster")),
      "vec_id")
      .select(col("cluster"), col("vec_id"), col("emb"), col("norm"))
    val pRoot = postingsRoot(root)
    val novel =
      if (TxTable.latest(spark, pRoot)._1 > 0)
        assigned.join(
          TxTable.read(spark, pRoot).select("vec_id").distinct(),
          Seq("vec_id"), "left_anti")
      else assigned
    val cut = novel.localCheckpoint(false)
    val n = cut.count()
    if (n > 0) TxTable.appendCommit(spark, pRoot, cut, "cluster")
    n
  }

  /** ANN query against the persisted index: `queries` is (vec_id,
    * embedding) rows; returns (q_id, vec_id, cosine, rank) — the
    * exact [[IvfOps.probeRank]] semantics (rounded-cosine ranking,
    * vec_id tie-break, self-match excluded, top `k` per query over the
    * `nprobe` nearest cells' postings). */
  def query(
      spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    // partition-column values come back type-inferred from the path
    // (INT for small cluster ids) — normalize to the written LONG
    val corpus = TxTable.read(spark, postingsRoot(root))
      .select(col("vec_id"), col("emb"), col("norm"),
        col("cluster").cast(LongType).as("cluster"))
    val cents = TxTable.read(spark, centroidsRoot(root)).select(col("cid"), col("cemb"))
    IvfOps.probeRank(corpus, IvfOps.withNorm(queries), cents, k, nprobe)
  }

  /** Vector takedown — the index-side half of the corpus
    * right-to-erasure path ([[TxTable.deleteWhere]] is the corpus
    * half): remove `ids` from the postings so a deleted document's
    * embedding is never retrievable again at ANY nprobe. Partition-
    * local: only the cells that actually hold a hit are rewritten
    * (deleteWhere's affected-partition rewrite), untouched cells keep
    * their files; [[compact]] de-fragments afterwards if the takedown
    * left small survivor files. Centroids are NOT touched — the frozen
    * codebook is geometry, not content (it retains no per-vector
    * data), exactly as [[DedupIndex]] keeps its band spec across
    * deletes.
    *
    * Idempotent, which is what makes the cross-table takedown
    * crash-safe: erase(corpus.deleteWhere → index.delete) interrupted
    * between the two halves converges on replay — the corpus half
    * matches zero rows the second time, the index half completes.
    * Returns postings removed (0 on a pure replay).
    *
    * `ids` is a driver-side batch by design: takedown requests are
    * human-scale (the predicate broadcasts into the partition scan).
    * A corpus-scale purge is a rebuild, not a delete — chunk callers
    * who genuinely need millions of ids.
    *
    * Ordering caveat (the tombstone-free trade): [[append]]'s replay
    * idempotence is an anti-join against CURRENT postings, so an
    * ingest replay AFTER a takedown can re-add a deleted vector if its
    * source batch still contains it. Run the corpus-table delete
    * FIRST (as the erase flow above does) so replayed ingests re-read
    * a source that no longer has the row. */
  def delete(spark: SparkSession, root: String, ids: Seq[Long]): Long = {
    if (ids.isEmpty) return 0L
    val pRoot = postingsRoot(root)
    if (TxTable.latest(spark, pRoot)._1 == 0) return 0L // nothing committed yet
    TxTable.deleteWhere(spark, pRoot, "cluster",
      col("vec_id").isin(ids: _*))
  }

  /** Many small appends fragment the postings table (one file set per
    * commit); compact cells back to one file each. Pure layout — query
    * answers are unchanged (spec-pinned) — and atomic, same as every
    * TxTable commit. */
  def compact(spark: SparkSession, root: String): Unit =
    TxTable.compactAll(spark, postingsRoot(root), "cluster")

  /** Embedding stream → per-batch [[append]] (AvailableNow): the
    * growing-index ingest tier ([[CorpusIngest.runAvailableNow]]
    * shape). Batch replays after a crash are absorbed by append's
    * vec_id anti-join. */
  def runAppendAvailableNow(
      spark: SparkSession, root: String, sourceDir: String,
      sourceSchema: org.apache.spark.sql.types.StructType,
      checkpointDir: String): Unit = {
    val q = spark.readStream.schema(sourceSchema).parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch.sparkSession, root, batch)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Per-cell posting counts — the imbalance signal a re-build
    * decision reads (frozen centroids drift as the corpus grows). */
  def cellStats(spark: SparkSession, root: String): DataFrame =
    TxTable.read(spark, postingsRoot(root))
      .groupBy(col("cluster").cast(LongType).as("cluster"))
      .agg(count(lit(1)).as("postings"))
      .orderBy(col("cluster"))
}
