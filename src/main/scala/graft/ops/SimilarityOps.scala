package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (Array[Float] column).
  *
  * Baseline: brute-force cosine top-k — query side broadcast, candidate
  * side streamed; per-pair math is `zip_with`+`aggregate` HOFs in double
  * (sequential fold, bit-identical to DuckDB's list_dot_product, which the
  * oracle uses).
  *
  * Scale path: LSH-bucketed ANN (random-hyperplane signatures; Charikar
  * '02) — each vector hashed to a `nbits`-bit bucket by the sign of its
  * dot product with deterministic pseudo-random hyperplanes; search probes
  * only the query's bucket (+ optional hamming-1 neighbors). At 100 TB the
  * bucket join replaces the cross product with one shuffle keyed on
  * bucket id. Recall vs the exact baseline is ScalaTest-verified.
  */
object SimilarityOps {

  /** embedding cast float→double (exact widening). */
  private def embDouble(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Native kernel ([[graft.functions.DotExpr]]): same left-to-right
    * summation as the zip_with+aggregate HOF and DuckDB list_dot_product
    * (bit-identical for the oracle), without interpreted lambdas.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashFunctions.dot_product(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** nbits-bit random-hyperplane signature of an embedding; `table`
    * offsets the hyperplane seeds so each hash table is independent.
    * Native expression ([[graft.functions.RhpBucketExpr]]) — the
    * per-bit zip_with+aggregate HOF formulation was the q_ann_lsh
    * bench hotspot (interpreted lambdas).
    */
  def lshSignature(emb: Column, nbits: Int, table: Int = 0): Column =
    graft.functions.HashFunctions.rhp_bucket(emb, nbits, table)

  /** FIXED md5-dyadic random hyperplanes — the oracle-checkable bucket
    * kernel for [[annLsh]]'s twin: plane component (table, bit, i) =
    * [[PqOps.md5Dyadic]] of "salt:t:b:i"; projection = the native dot
    * kernel (list_dot_product summation order); bucket = the sign
    * bits assembled little-endian. A genuine random-hyperplane family
    * (md5 bits are as orientation-uniform as xxhash64's), just one
    * DuckDB can re-derive. Production stays on the xxhash64 kernel
    * ([[lshSignature]] — no per-row literal arrays).
    */
  def fixedRhpBucket(dim: Int, salt: String): (Column, Int, Int) => Column =
    (embCol, nbits, table) =>
      (0 until nbits).map { b =>
        val plane = array(Array.tabulate(dim)(i =>
          lit(PqOps.md5Dyadic(s"$salt:$table:$b:$i"))): _*)
        when(dot(embCol, plane) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)

  /** Brute-force cosine top-k: queries broadcast against all candidates. */
  def cosineTopK(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val base = emb.select(
      col("vec_id"),
      embDouble(col("embedding")).as("emb"))
      .withColumn("norm", l2norm(col("emb")))
    val q = base.filter(queryPred).select(
      col("vec_id").as("q_id"), col("emb").as("q_emb"), col("norm").as("q_norm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine", round(dot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rn").cast(LongType).as("rank"))
  }

  /** Bounded brute-force twin of [[cosineTopK]] — identical results
    * (same rounded-cosine ordering, same vec_id tie-break; spec- and
    * oracle-pinned), different physical shape: the per-query top-k
    * runs through [[graft.functions.TopKAgg]]'s capacity-bounded
    * partial buffers instead of a `row_number()` window. The window
    * formulation locally SORTS every (query × corpus-slice) candidate
    * row per task before WindowGroupLimit can drop any — at 10M
    * vectors × 100 queries that local sort is the spill that killed
    * the r9 recall soak — while the aggregate keeps O(queries · 2k)
    * rows of state per task and moves O(queries · k) through the
    * shuffle. This is the exact-baseline path the ANN recall soaks
    * use; prefer it whenever queries × corpus is large.
    */
  def cosineTopKAgg(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    import emb.sparkSession.implicits._
    val base = emb.select(
      col("vec_id"),
      embDouble(col("embedding")).as("emb"))
      .withColumn("norm", l2norm(col("emb")))
    val q = base.filter(queryPred).select(
      col("vec_id").as("q_id"), col("emb").as("q_emb"), col("norm").as("q_norm"))
    val topk = new graft.functions.TopKAgg(k)
    base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(
        col("q_id"),
        round(dot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")), 6).as("cosine"),
        col("vec_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.toColumn)
      .toDF("q_id", "topk")
      .select(col("q_id"), posexplode(col("topk.items")).as(Seq("pos", "e")))
      .select(
        col("q_id"), col("e.id").as("vec_id"), col("e.value").as("cosine"),
        (col("pos") + 1).cast(LongType).as("rank"))
  }

  /** Multi-table LSH ANN: `ntables` independent random-hyperplane hash
    * tables; a candidate is any vector sharing the query's bucket in ANY
    * table (standard OR-amplification — recall ≈ 1-(1-p^nbits)^ntables).
    * The probe join shuffles on (table_id, bucket); candidate set is
    * deduped before the exact cosine re-rank, so the expensive math runs
    * once per distinct candidate pair.
    */
  def annLsh(
      emb: DataFrame,
      queryPred: Column,
      k: Int,
      nbits: Int = 4,
      ntables: Int = 8,
      bucketFn: (Column, Int, Int) => Column = lshSignature(_, _, _)): DataFrame = {
    val base = emb.select(col("vec_id"), embDouble(col("embedding")).as("emb"))
      .withColumn("norm", l2norm(col("emb")))
      .withColumn("buckets",
        array((0 until ntables).map(t => bucketFn(col("emb"), nbits, t)): _*))
    val tabled = base.select(
      col("vec_id"), col("emb"), col("norm"),
      posexplode(col("buckets")).as(Seq("table_id", "bucket")))
    val q = tabled.filter(queryPred).select(
      col("vec_id").as("q_id"), col("emb").as("q_emb"), col("norm").as("q_norm"),
      col("table_id").as("q_table"), col("bucket").as("q_bucket"))
    val candidates = tabled
      .join(broadcast(q),
        col("table_id") === col("q_table") && col("bucket") === col("q_bucket") &&
          col("vec_id") =!= col("q_id"))
      .select("q_id", "q_emb", "q_norm", "vec_id", "emb", "norm")
      .dropDuplicates("q_id", "vec_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    candidates
      .withColumn("cosine", round(dot(col("emb"), col("q_emb")) / (col("norm") * col("q_norm")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rn").cast(LongType).as("rank"))
  }

  val all: Seq[QueryDef] = Seq(

    // Embedding sanity kernel: L2 norm + dimensionality.
    QueryDef(
      "q_embed_norm",
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast(LongType).as("dim"),
          round(l2norm(embDouble(col("embedding"))), 6).as("l2"))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-3 for 10 query vectors.
    QueryDef(
      "q_cosine_topk",
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb, norm AS q_norm FROM n WHERE vec_id < 10),
        |p AS (
        |  SELECT q_id, vec_id,
        |    round(list_dot_product(emb, q_emb) / (norm * q_norm), 6) AS cosine
        |  FROM n, q WHERE vec_id <> q_id)
        |SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn FROM p)
        |WHERE rn <= 3
        |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      cosineTopK(Tables.embeddings(s, d), col("vec_id") < 10, 3)
        .orderBy("q_id", "rank")
    },

    // The bounded-aggregate twin of q_cosine_topk: same answer (same
    // oracle SQL), TopKAgg physical shape — the exact-baseline kernel
    // the ANN recall soaks run, oracle-checked here at suite SF.
    QueryDef(
      "q_cosine_topk_agg",
      """WITH n AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS emb,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS q_emb, norm AS q_norm FROM n WHERE vec_id < 10),
        |p AS (
        |  SELECT q_id, vec_id,
        |    round(list_dot_product(emb, q_emb) / (norm * q_norm), 6) AS cosine
        |  FROM n, q WHERE vec_id <> q_id)
        |SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn FROM p)
        |WHERE rn <= 3
        |ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      cosineTopKAgg(Tables.embeddings(s, d), col("vec_id") < 10, 3)
        .orderBy("q_id", "rank")
    },

    // The SAME multi-table LSH pipeline (bucket → OR-amplified probe
    // join → dedup → exact cosine re-rank) under FIXED md5-dyadic
    // hyperplanes — the oracle twin of q_ann_lsh: plane component
    // (t, b, i) is a centered dyadic rational both engines derive from
    // the same md5, each projection is one list_dot_product-order fold,
    // and the sign bits assemble the bucket integer identically.
    QueryDef(
      "q_ann_lsh_md5",
      """WITH pl AS (
        |  SELECT t, b, i,
        |    CAST(CAST(('0x' || substring(md5('rhp:' || t || ':' || b || ':' || i), 1, 13)) AS BIGINT)
        |      AS DOUBLE) / 4503599627370496.0 - 0.5 AS v
        |  FROM generate_series(0, 7) AS gt(t), generate_series(0, 3) AS gb(b),
        |       generate_series(0, 63) AS gi(i)),
        |pll AS (SELECT t, b, list(v ORDER BY i) AS pv FROM pl GROUP BY t, b),
        |e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS de,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |proj AS (
        |  SELECT e.vec_id, pll.t, pll.b, list_dot_product(e.de, pll.pv) AS p
        |  FROM e, pll),
        |buck AS (
        |  SELECT vec_id, t,
        |    CAST(sum(CASE WHEN p >= 0 THEN 1 << b ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY vec_id, t),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id
        |  FROM buck q JOIN buck c ON c.t = q.t AND c.bucket = q.bucket
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id,
        |    round(list_dot_product(a.de, b.de) / (a.norm * b.norm), 6) AS cosine
        |  FROM cand JOIN e a ON a.vec_id = cand.q_id JOIN e b ON b.vec_id = cand.vec_id)
        |SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT q_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        |  FROM scored)
        |WHERE rn <= 3 ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      annLsh(Tables.embeddings(s, d), col("vec_id") < 10, 3,
        bucketFn = fixedRhpBucket(dim = 64, salt = "rhp"))
        .orderBy("q_id", "rank")
    },

    // LSH-bucketed ANN, xxhash64 hyperplanes. ORACLED since r8 via the
    // bucket dump ([[OracleDump]]): the (vec_id, table_id, bucket)
    // frame — the one step DuckDB cannot compute — is the input, and
    // the OR-amplified probe join, candidate dedup, and the exact
    // cosine re-rank (computed by DuckDB from the raw embeddings,
    // fully independently) are what the oracle hash-checks. The
    // hyperplane kernel's recall stays ScalaTest-verified.
    QueryDef(
      "q_ann_lsh",
      s"""WITH buck AS (
        |  SELECT vec_id, table_id, bucket
        |  FROM read_parquet('${OracleDump.path("rhp_buckets")}')),
        |e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS de,
        |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings),
        |cand AS (
        |  SELECT DISTINCT q.vec_id AS q_id, c.vec_id
        |  FROM buck q JOIN buck c ON c.table_id = q.table_id AND c.bucket = q.bucket
        |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT cand.q_id, cand.vec_id,
        |    round(list_dot_product(a.de, b.de) / (a.norm * b.norm), 6) AS cosine
        |  FROM cand JOIN e a ON a.vec_id = cand.q_id JOIN e b ON b.vec_id = cand.vec_id)
        |SELECT q_id, vec_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
        |  SELECT q_id, vec_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rn
        |  FROM scored)
        |WHERE rn <= 3 ORDER BY q_id, rank""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      OracleDump.write(
        emb.select(col("vec_id"), embDouble(col("embedding")).as("emb"))
          .select(col("vec_id"),
            posexplode(array((0 until 8).map(t => lshSignature(col("emb"), 4, t)): _*))
              .as(Seq("table_id", "bucket"))),
        d, "rhp_buckets")
      annLsh(emb, col("vec_id") < 10, 3)
        .orderBy("q_id", "rank")
    },

    // approx_count_distinct (HLL++) next to the exact count, with the
    // 3σ error-bound VERDICT as a column (default rsd 0.05 → ±15%).
    // The sketch value itself is engine-specific, but the exact count
    // and the verdict are oracle-checkable: DuckDB re-derives the exact
    // side from the data and pins the verdict true — a Spark regression
    // that breaks the HLL bound flips the boolean and the hash.
    // TRIAGE MARGIN (a future red row here may be estimator variance,
    // not a regression): ±15% is the 3σ band of rsd=0.05, i.e. an
    // honest sketch still lands outside it with p ≈ 0.003 per group —
    // deterministic at the fixed driver data/SF today, but a NEW SF or
    // a Spark-side HLL++ implementation change can legitimately flip
    // the boolean. Check est/exact against the band before assuming a
    // correctness bug.
    QueryDef(
      "q_approx_distinct",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(
          col("event_type"), col("exact_users"),
          (col("approx_users") >= col("exact_users") * 0.85 &&
            col("approx_users") <= col("exact_users") * 1.15).as("approx_ok"))
        .orderBy("event_type")
    })
}
