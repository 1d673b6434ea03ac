package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hard-negative mining over the `embeddings` table — the contrastive /
  * dual-encoder training-data producer (DPR, Karpukhin '20; ANCE, Xiong
  * '21). The reference pipeline's surface ends at relational aggregates
  * (`/root/reference/dbt/models/marts/daily_power_summary.sql`); this is
  * the extension-surface op that turns an embedding column + a relevance
  * signal (the `label` column here) into training triples: for each
  * query vector, its best same-label POSITIVE and the top-k
  * most-similar DIFFERENT-label HARD NEGATIVES — the near-misses a
  * contrastive loss learns the most from (random negatives are too easy;
  * the highest-cosine wrong-label rows define the decision boundary).
  *
  * Two tiers, the [[SimilarityOps]] convention:
  *  - [[hardNegatives]]: exact brute-force — bounded query batch
  *    broadcast, ONE streamed pass over the corpus, cosine computed once
  *    per (query, candidate) and ranked per (query, role). This is the
  *    oracle-checkable baseline and the right shape when the query batch
  *    is a training mini-batch (hundreds of rows) — at 100 TB the corpus
  *    side streams partition-parallel and nothing is quadratic in corpus
  *    size, only corpus × |batch|.
  *  - [[hardNegativesIndexed]]: corpus-scale path — negatives only (in
  *    production the positives are SUPERVISED pairs, not mined), fetched
  *    from the persisted IVF index ([[graft.pipeline.AnnIndex]]) with an
  *    overfetch of kNeg + reserve, then label-filtered and re-ranked.
  *    Probes read only `nprobe` cells' partitions; mining every
  *    document against a 10^10-vector corpus costs O(docs × probed
  *    postings), never the cross product. Full-probe equality with the
  *    exact tier and pruned-probe recall are ScalaTest-verified
  *    (MiningSpec).
  *
  * Ranking is over the 6-dp-ROUNDED cosine with vec_id tie-break — the
  * [[SimilarityOps.cosineTopK]] determinism convention, which is also
  * what makes the DuckDB oracle exact.
  */
object MiningOps {

  private def embDouble(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Exact hard-negative mining: for each query row (selected by
    * `queryPred`), emit its rank-1 same-label positive and the `kNeg`
    * highest-cosine different-label negatives. Output:
    * (q_id, vec_id, role ∈ {pos,neg}, cosine, rank) — rank is per
    * (q_id, role), so a triple loader reads `role='pos'` rank 1 and
    * `role='neg'` ranks 1..kNeg.
    */
  def hardNegatives(emb: DataFrame, queryPred: Column, kNeg: Int): DataFrame = {
    require(kNeg >= 1, s"kNeg must be >= 1 (got $kNeg): the rank-<=kNeg bound also admits the positive's rank-1 row")
    val base = emb.select(
      col("vec_id"), col("label"),
      embDouble(col("embedding")).as("emb"))
      .withColumn("norm", SimilarityOps.l2norm(col("emb")))
    val q = base.filter(queryPred).select(
      col("vec_id").as("q_id"), col("label").as("q_label"),
      col("emb").as("q_emb"), col("norm").as("q_norm"))
    val w = Window.partitionBy(col("q_id"), col("role"))
      .orderBy(col("cosine").desc, col("vec_id"))
    base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("role",
        when(col("label") === col("q_label"), lit("pos")).otherwise(lit("neg")))
      .withColumn("cosine",
        round(SimilarityOps.dot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")), 6))
      .withColumn("rn", row_number().over(w))
      // the rank bound stands ALONE as a conjunct (kNeg ≥ 1 covers the
      // pos role's rank-1 row) so InferWindowGroupLimit can lift it
      // into a Partial/Final WindowGroupLimit pair — a disjunctive
      // rank predicate would leave a full per-(q_id, role) sort
      .filter(col("rn") <= kNeg)
      .filter(col("role") === "neg" || col("rn") === 1)
      .select(col("q_id"), col("vec_id"), col("role"),
        col("cosine"), col("rn").cast(LongType).as("rank"))
  }

  /** Index-backed NEGATIVE mining against a persisted
    * [[graft.pipeline.AnnIndex]] — the production DPR/ANCE shape, where
    * (query, positive) pairs come from SUPERVISION and only the hard
    * negatives are mined: one probe per query fetches `kNeg + reserve`
    * nearest neighbors (cosine order, cells pre-pruned to `nprobe`),
    * labels join in from the supervision frame, same-label rows (the
    * supervised positives — false negatives if kept) are dropped, and
    * the top `kNeg` of the remainder are the negatives. `reserve` is
    * the overfetch that absorbs same-label intrusions in the pool;
    * with a full probe and enough reserve the result EQUALS the exact
    * tier's negatives (MiningSpec pins it), and with a pruned probe
    * recall degrades exactly like the underlying index's.
    */
  def hardNegativesIndexed(
      spark: SparkSession, indexRoot: String,
      queries: DataFrame, labels: DataFrame,
      kNeg: Int, nprobe: Int, reserve: Int = 16): DataFrame = {
    val pool = graft.pipeline.AnnIndex.query(
      spark, indexRoot, queries, k = kNeg + reserve, nprobe = nprobe)
    val qLab = labels.select(col("vec_id").as("q_id"), col("label").as("q_label"))
    val cLab = labels.select(col("vec_id"), col("label"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pool
      .join(broadcast(qLab), "q_id")
      .join(cLab, "vec_id")
      .filter(col("label") =!= col("q_label"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= kNeg)
      .select(col("q_id"), col("vec_id"), lit("neg").as("role"),
        col("cosine"), col("rn").cast(LongType).as("rank"))
  }

  val all: Seq[QueryDef] = Seq(

    // Contrastive triples for 10 query vectors: best positive + top-5
    // hard negatives each. Exact tier; ranked on rounded cosine with
    // vec_id tie-break on both sides.
    QueryDef(
      "q_hard_negatives",
      """WITH n AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS emb,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id AS q_id, label AS q_label, emb AS q_emb, norm AS q_norm
        |  FROM n WHERE vec_id < 10),
        |p AS (
        |  SELECT q_id, vec_id,
        |    CASE WHEN label = q_label THEN 'pos' ELSE 'neg' END AS role,
        |    round(list_dot_product(emb, q_emb) / (norm * q_norm), 6) AS cosine
        |  FROM n, q WHERE vec_id <> q_id),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY q_id, role ORDER BY cosine DESC, vec_id) AS rn
        |  FROM p)
        |SELECT q_id, vec_id, role, cosine, CAST(rn AS BIGINT) AS rank FROM r
        |WHERE (role = 'pos' AND rn = 1) OR (role = 'neg' AND rn <= 5)
        |ORDER BY q_id, role, rank""".stripMargin) { (s, d) =>
      hardNegatives(Tables.embeddings(s, d), col("vec_id") < 10, 5)
        .orderBy("q_id", "role", "rank")
    })
}
