package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.UnigramLmOps.UnigramModel

/** Persisted tokenizer models — the train-once / apply-everywhere
  * contract the tokenizer family needs in production (the
  * [[AnnIndex]]/[[DedupIndex]] discipline applied to vocabularies):
  * a tokenizer trained on one corpus snapshot must be STORED as a
  * versioned artifact and reloaded bit-exactly by every later job —
  * training shards, eval pipelines, the serving tier — because two
  * "almost equal" vocabularies silently produce different token ids
  * for the same text.
  *
  * Both model kinds persist as [[TxTable]]s (atomic commits, versioned
  * reads, vacuum/retention semantics for free):
  *  - unigram LM: one row per piece — (piece, logp). logp is the
  *    trained double, stored losslessly by parquet; reload rebuilds
  *    the driver Map exactly (spec-pinned ==, not ≈).
  *  - BPE: one row per merge — (rank, a, b). Rank preserves the
  *    LEARNED ORDER, which is semantically load-bearing (BPE applies
  *    merges in training order; a reordered table is a different
  *    tokenizer).
  *
  * Models are deliberately re-commitable: committing version N+1 with
  * a retrained model is the upgrade path, and readers pin a version
  * via [[TxTable.readAt]] when they need a frozen vocabulary across a
  * multi-job pipeline run.
  */
object TokenizerStore {

  private val Part = "part" // single-partition blob, the centroids convention

  /** Persist a trained unigram model (one atomic commit). */
  def saveUnigram(spark: SparkSession, root: String, model: UnigramModel): Unit = {
    import spark.implicits._
    TxTable.commit(
      spark, root,
      model.logp.toSeq.sortBy(_._1).toDF("piece", "logp")
        .withColumn(Part, lit("all")),
      Part)
  }

  /** Reload the latest unigram model, bit-exact. */
  def loadUnigram(spark: SparkSession, root: String): UnigramModel =
    UnigramModel(
      TxTable.read(spark, root).select("piece", "logp")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)

  /** Reload the unigram model pinned at `version`. */
  def loadUnigramAt(spark: SparkSession, root: String, version: Long): UnigramModel =
    UnigramModel(
      TxTable.readAt(spark, root, version).select("piece", "logp")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)

  /** Persist a learned BPE merge table in learned order. */
  def saveBpe(spark: SparkSession, root: String, merges: Seq[(String, String)]): Unit = {
    import spark.implicits._
    TxTable.commit(
      spark, root,
      merges.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("rank", "a", "b")
        .withColumn(Part, lit("all")),
      Part)
  }

  /** Reload the latest merge table in learned order. */
  def loadBpe(spark: SparkSession, root: String): Seq[(String, String)] =
    TxTable.read(spark, root).select("rank", "a", "b")
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq

  /** Reload the merge table pinned at `version`. */
  def loadBpeAt(spark: SparkSession, root: String, version: Long): Seq[(String, String)] =
    TxTable.readAt(spark, root, version).select("rank", "a", "b")
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
}
