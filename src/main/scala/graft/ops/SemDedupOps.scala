package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-flavor semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, then prune
  * near-identical pairs WITHIN each cluster only — the clustering turns
  * the quadratic all-pairs cosine screen into per-cell work, the same
  * move MinHash-LSH makes for text ([[DedupOps]]) and the IVF cell join
  * makes for `q_embed_near_dup`.
  *
  * Survivor rule: FIRST-WIN — a vector is dropped when an EARLIER
  * (lower-id) vector in its cluster sits at or above the cosine
  * threshold, and `dup_of` records the earliest such vector. Greedy
  * first-win (the paper keeps one point per ε-ball) rather than
  * connected components: a chain a~b, b~c with a≁c keeps a AND c here,
  * whereas [[DedupOps.dedupGroups]]' transitive closure would collapse
  * all three. Both semantics are offered corpus-wide; this one needs no
  * iteration.
  *
  * Scale shape: one broadcast pass assigns cells (centroids are nlist
  * rows, never data-sized); the pair screen shuffles ONCE on cluster id
  * and is quadratic only within a cell — bounded by the clustering, not
  * the corpus. The per-vector min-reduce is a hash agg on vec_id. No
  * all-pairs product exists anywhere in the plan.
  *
  * `q_semantic_dedup` keeps the whole pipeline under the DuckDB hash
  * oracle via the deterministic first-nlist stand-in centroids (the
  * `q_ivf_assign` convention); [[semanticDedup]] is the library entry
  * that composes with real [[KMeans]] centroids (float k-means is
  * summation-order-dependent, so the trained path is spec-verified, not
  * hash-verified — same split as `q_ivf_ann` vs `q_ivf_ann_trained`).
  */
object SemDedupOps {
  import SimilarityOps.dot

  /** First-win semantic dedup over (vec_id, cluster, emb, norm) rows:
    * returns (vec_id, cluster, dup_of, kept). `dup_of` = earliest
    * lower-id cluster-mate with cosine >= threshold, null when kept.
    */
  def semanticDedup(assigned: DataFrame, threshold: Double): DataFrame = {
    val a = assigned.select(
      col("cluster"), col("vec_id").as("earlier"), col("emb").as("ea"), col("norm").as("na"))
    val b = assigned.select(
      col("cluster").as("cluster_b"), col("vec_id"), col("emb").as("eb"), col("norm").as("nb"))
    val dupOf = a.join(b, col("cluster") === col("cluster_b") && col("earlier") < col("vec_id"))
      .filter(round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6) >= threshold)
      .groupBy("vec_id")
      .agg(min(col("earlier")).as("dup_of"))
    assigned.select("vec_id", "cluster")
      .join(dupOf, Seq("vec_id"), "left")
      .withColumn("kept", col("dup_of").isNull)
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_semantic_dedup",
      s"""${IvfOps.assignSql},
         |dup AS (
         |  SELECT b.vec_id, min(a.vec_id) AS dup_of
         |  FROM assign a JOIN assign b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE round(list_dot_product(a.emb, b.emb) / (a.norm * b.norm), 6) >= 0.4
         |  GROUP BY b.vec_id)
         |SELECT s.vec_id, s.cluster, d.dup_of, d.dup_of IS NULL AS kept
         |FROM assign s LEFT JOIN dup d ON s.vec_id = d.vec_id
         |ORDER BY s.vec_id""".stripMargin) { (s, d) =>
      semanticDedup(IvfOps.assign(s, d, 16), 0.4).orderBy("vec_id")
    })
}
