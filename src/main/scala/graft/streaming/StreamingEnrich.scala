package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.BloomOps

/** Stream-against-static enrichment with per-batch key pushdown — the
  * streaming complement of [[graft.ops.BloomOps.bloomPrefilteredJoin]]
  * with the build/probe roles INVERTED: in batch the small side is the
  * dimension and the bloom guards the fact shuffle; in streaming
  * enrichment the huge side is the STATIC table (a 100 TB dimension /
  * feature store) and the small side is the micro-batch, so the filter
  * is built from the BATCH'S keys and pushed into the static scan.
  * Without it, every micro-batch pays a full static-table scan to
  * enrich a few thousand rows — the canonical streaming-join scale trap.
  *
  * Two regimes, chosen per batch by a bounded probe (limit k+1, never a
  * full count of the batch):
  *
  *   - few distinct keys (≤ `maxInListKeys`): an `isin` literal list —
  *     Catalyst pushes `In` to the parquet scan (row-group stats
  *     skipping), and over a [[graft.pipeline.BloomIndex.readIndexed]]
  *     frame the custom FileIndex drops whole FILES at listing time.
  *     This is the common regime: a micro-batch touches a tiny key set.
  *   - many keys: one distributed pass folds the batch keys into a
  *     bloom ([[BloomOps.buildBloom]] — only filter bytes reach the
  *     driver) and the static side drops non-joining rows at the scan
  *     with a codegen'd `might_contain` before any exchange.
  *
  * Both are semantics-free: rows the filter passes spuriously (bloom
  * false positives) are eliminated by the exact join that still runs —
  * the spec asserts bit-parity with the unfiltered join.
  *
  * Usable directly inside any `foreachBatch`; [[runEnrichAvailableNow]]
  * is the packaged file-stream → enriched-parquet pipeline.
  */
object StreamingEnrich {

  /** Enrich one (micro-)batch against `static`: left join on
    * `streamKey` = `staticKey`, with the static scan pre-filtered by
    * the batch's key set. Exactly `batch.join(static, cond, "left")`
    * minus the wasted static scan output.
    */
  def enrichBatch(
      batch: DataFrame, static: DataFrame,
      streamKey: String, staticKey: String,
      maxInListKeys: Int = 1024, fpp: Double = 0.01): DataFrame = {
    val cond: Column = col(streamKey) === col(staticKey)
    val keys = batch.select(col(streamKey)).na.drop().distinct()
    batch.join(
      BloomOps.filterToKeySet(static, col(staticKey), keys, maxInListKeys, fpp),
      cond, "left")
  }

  /** File-source stream → per-batch pushdown enrichment → parquet
    * append. `staticFor` is re-invoked per batch so callers can hand a
    * [[graft.pipeline.BloomIndex.readIndexed]] frame (file-skipping) or
    * a [[graft.pipeline.TxTable.read]] snapshot.
    */
  def runEnrichAvailableNow(
      spark: org.apache.spark.sql.SparkSession,
      sourceDir: String,
      sourceSchema: org.apache.spark.sql.types.StructType,
      staticFor: org.apache.spark.sql.SparkSession => DataFrame,
      streamKey: String, staticKey: String,
      outPath: String, checkpointDir: String,
      maxInListKeys: Int = 1024): Unit = {
    val q = spark.readStream
      .schema(sourceSchema)
      .parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        enrichBatch(batch, staticFor(batch.sparkSession), streamKey, staticKey, maxInListKeys)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
    q.awaitTermination()
  }
}
