package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al. '11) — the compression end of the
  * ANN family (brute → LSH → IVF → PQ): split each vector into `m`
  * blocks, k-means each block's subvectors into `k` codes, store a
  * vector as `m` small ints (e.g. 64 float dims → 8 bytes at m=8,k=256,
  * a 32× compression). Search uses asymmetric distance computation
  * (ADC): per query, precompute an m×k table of block distances to every
  * code once, then a candidate's distance is m table lookups — no float
  * math per candidate.
  *
  * Scale shape: training collects only a bounded hash sample
  * ([[KMeans.fitSample]]-style); the codebooks (m×k×subdim doubles) and
  * per-query ADC tables broadcast to every executor; encode and search
  * are single map-shaped passes over the corpus (mapPartitions — the
  * per-row inner loop is an argmin over a broadcast model, the same
  * partition-local-imperative case as the multimodal codec). Float
  * k-means training keeps this off the hash oracle (see IvfOps);
  * PqSpec pins recall on planted blobs and the compression/error
  * tradeoff instead.
  */
object PqOps {

  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks(0).length
    def subdim: Int = codebooks(0)(0).length
  }

  final case class Encoded(vec_id: Long, codes: Array[Int], recon_err2: Double)

  private def d2(a: Array[Double], b: Array[Double], aOff: Int): Double = {
    var s = 0.0; var i = 0
    while (i < b.length) { val d = a(aOff + i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train per-block codebooks on a deterministic hash sample. `dim`
    * must divide evenly into `m` blocks.
    */
  def train(emb: DataFrame, m: Int, k: Int = 256, iters: Int = 8,
      maxSample: Int = KMeans.DefaultMaxSample): PqModel =
    trainArrays(KMeans.samplePoints(emb, maxSample), m, k, iters) // ONE sampling convention with IVF training

  /** Deterministic FIXED codebook for the oracle-checkable encode path:
    * entry (b, c, j) = first 52 md5 bits of "salt:b:c:j" / 2^52 − 0.5 —
    * a centered dyadic rational both engines represent exactly, so
    * DuckDB re-derives the identical codebook from the same md5 and the
    * whole encode (sequential squared-diff fold, argmin with lowest-id
    * tie-break) is bit-for-bit reproducible in SQL. Training stays the
    * production path ([[train]]); this pins the ENCODE kernel itself to
    * the hash oracle the way `q_minhash_lsh_md5` pins banding.
    */
  def fixedModel(dim: Int, m: Int, k: Int, salt: String = "pq"): PqModel = {
    val sub = dim / m
    PqModel(Array.tabulate(m, k, sub) { (b, c, j) => md5Dyadic(s"$salt:$b:$c:$j") })
  }

  /** First 52 md5 bits of `key` as a centered dyadic rational in
    * [-0.5, 0.5) — exactly representable in both engines, so DuckDB
    * re-derives the identical double from the same md5. The shared
    * derivation behind every fixed stand-in model (PQ/IVFADC codebooks,
    * RHP hyperplanes).
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[ops] def md5Dyadic(key: String): Double = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(key.getBytes("UTF-8"))
    // first 13 hex digits = bytes 0..5 in full plus the high nibble of
    // byte 6 (bit-identical to parsing the hex prefix, without the
    // per-byte format/parse round trip — this runs per lattice
    // position in sampleTokenize's hot path)
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(6) & 0xf0L) >> 4)
    v.toDouble / 4503599627370496.0 - 0.5
  }

  /** Points-based variant — shared with OPQ, which trains on ROTATED
    * sample points rather than a fresh sample.
    */
  private[graft] def trainArrays(pts: Array[Array[Double]], m: Int, k: Int,
      iters: Int): PqModel = {
    require(pts.nonEmpty, "PQ training sample is empty")
    val dim = pts(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m blocks")
    val sub = dim / m
    val books = (0 until m).toArray.map { b =>
      val block = pts.map(p => java.util.Arrays.copyOfRange(p, b * sub, (b + 1) * sub))
      KMeans.fitArrays(block, k, iters).centroids
    }
    PqModel(books)
  }

  /** Encode every vector: per block, the nearest code id (argmin L2,
    * ties → lowest id); recon_err2 = squared L2 between the vector and
    * its code reconstruction.
    */
  def encode(emb: DataFrame, model: PqModel): Dataset[Encoded] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    emb.select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("e"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val mod = bc.value
        val sub = mod.subdim
        it.map { case (id, eSeq) =>
          val e = eSeq.toArray
          val codes = new Array[Int](mod.m)
          var err = 0.0
          var b = 0
          while (b < mod.m) {
            val book = mod.codebooks(b)
            var best = 0; var bd = Double.MaxValue; var c = 0
            while (c < book.length) {
              val d = d2(e, book(c), b * sub)
              if (d < bd) { bd = d; best = c }
              c += 1
            }
            codes(b) = best; err += bd; b += 1
          }
          Encoded(id, codes, err)
        }
      }
  }

  /** ADC top-k: queries are collected (the serve-side is a handful of
    * vectors), their m×k distance tables broadcast, and one pass over
    * the ENCODED corpus scores every candidate with m lookups. Returns
    * (q_id, vec_id, adist, rank) — approximate L2² distances, totally
    * ordered.
    */
  def searchAdc(
      encoded: Dataset[Encoded],
      queries: DataFrame, // (q_id, embedding)
      model: PqModel,
      topk: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col("q_id"), transform(col("embedding"), _.cast(DoubleType)).as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val tables = qs.map { case (qid, q) =>
      val t = Array.ofDim[Double](model.m, model.k)
      var b = 0
      while (b < model.m) {
        var c = 0
        while (c < model.k) { t(b)(c) = d2(q, model.codebooks(b)(c), b * model.subdim); c += 1 }
        b += 1
      }
      (qid, t)
    }
    val bc = spark.sparkContext.broadcast(tables)
    val scored = encoded.mapPartitions { it =>
      val ts = bc.value
      it.flatMap { enc =>
        ts.iterator.map { case (qid, t) =>
          var s = 0.0; var b = 0
          while (b < enc.codes.length) { s += t(b)(enc.codes(b)); b += 1 }
          (qid, enc.vec_id, math.rint(s * 1e6) / 1e6)
        }
      }
    }.toDF("q_id", "vec_id", "adist")
      .filter(col("q_id") =!= col("vec_id"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select(col("q_id"), col("vec_id"), col("adist"), col("rank").cast(LongType).as("rank"))
      .orderBy("q_id", "rank")
  }

  /** Exact L2 re-rank of a (q_id, vec_id) candidate frame against the
    * raw vectors — shared by PQ and IVFADC search. Ranks on
    * FULL-precision distances (rounding first would create artificial
    * ties among close neighbors and let the id tie-break pick the wrong
    * one); rounds only the emitted column. |v-q|² via the native dot
    * kernel (v·v − 2v·q + q·q) — interpreted HOF folds are the repo's
    * measured ~100× hot spot, and real deployments run 100-1000× topk
    * pools through this stage. Returns (q_id, vec_id, dist2, rank),
    * totally ordered.
    */
  def exactRerank(cand: DataFrame, emb: DataFrame, queries: DataFrame, topk: Int): DataFrame = {
    import graft.functions.HashFunctions.dot_product
    val qdf = queries.select(
      col("q_id"), transform(col("embedding"), _.cast(DoubleType)).as("qe"))
    val vdf = emb.select(
      col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("ve"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2raw").asc, col("vec_id").asc)
    // Broadcast the WHOLE candidate side (pool rows × query vectors — a
    // few thousand rows at most): the corpus embeddings scan must stay
    // map-shaped (BroadcastHashJoin), never hash-shuffle on vec_id.
    vdf.join(broadcast(cand.select("q_id", "vec_id").join(broadcast(qdf), "q_id")), "vec_id")
      .withColumn("d2raw",
        dot_product(col("ve"), col("ve")) - lit(2.0) * dot_product(col("ve"), col("qe")) +
          dot_product(col("qe"), col("qe")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topk)
      .select(
        col("q_id"), col("vec_id"),
        round(col("d2raw"), 6).as("dist2"), col("rank").cast(LongType).as("rank"))
      .orderBy("q_id", "rank")
  }

  /** The production PQ search shape: ADC generates a candidate pool
    * (cheap — table lookups over compressed codes), exact L2 re-ranks
    * only the pool. PQ codes are lossy by design, so ADC top-k ALONE
    * mixes up close neighbors (quantization error ~ within-cluster
    * distances); the re-rank restores exactness at pool-size cost.
    */
  def searchAdcRerank(
      encoded: Dataset[Encoded],
      emb: DataFrame,
      queries: DataFrame,
      model: PqModel,
      topk: Int,
      poolSize: Int = 0): DataFrame = {
    val pool = if (poolSize > 0) poolSize else 10 * topk
    exactRerank(searchAdc(encoded, queries, model, pool), emb, queries, topk)
  }

  /** The shared encode→report projection (codes stringified: the
    * driver's compare sorts in pandas, where an array column is an
    * unhashable ndarray — round-2 red row).
    */
  private[ops] def encodeReport(emb: DataFrame, model: PqModel): DataFrame =
    encode(emb, model).toDF()
      .select(
        col("vec_id"),
        array_join(col("codes").cast("array<string>"), ",").as("codes"),
        round(sqrt(col("recon_err2")), 6).as("recon_err"))
      .orderBy("vec_id")

  /** DuckDB re-derivation of [[encode]] under [[fixedModel]]: identical
    * dyadic codebook from md5, identical sequential fold order (float
    * addition is order-sensitive — list_reduce and the kernel's while
    * loop both run in index order, so the doubles match bit-for-bit),
    * identical lowest-id argmin tie-break. `perm(i)` maps logical
    * dimension i to the embedding index read — identity for plain PQ,
    * a stride permutation for the OPQ twin.
    */
  /** The shared cb/cbl/dist CTE prefix: md5-dyadic codebook + per
    * (vec_id, b, c) block distance of every embedding to every code —
    * the common front half of the encode twin and the full-ANN twin.
    */
  private def fixedDistCtes(salt: String, perm: String => String): String = {
    val idx = perm("(cbl.b * 8 + j)")
    s"""WITH cb AS (
       |  SELECT b, c, j,
       |    CAST(CAST(('0x' || substring(md5('$salt:' || b || ':' || c || ':' || j), 1, 13)) AS BIGINT)
       |      AS DOUBLE) / 4503599627370496.0 - 0.5 AS v
       |  FROM generate_series(0, 7) AS gb(b), generate_series(0, 15) AS gc(c), generate_series(0, 7) AS gj(j)),
       |cbl AS (SELECT b, c, list(v ORDER BY j) AS cv FROM cb GROUP BY b, c),
       |dist AS (
       |  SELECT e.vec_id, cbl.b, cbl.c,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (CAST(e.embedding[$idx + 1] AS DOUBLE) - cbl.cv[j + 1])
       |        * (CAST(e.embedding[$idx + 1] AS DOUBLE) - cbl.cv[j + 1]) FOR j IN range(0, 8) ]),
       |      (a, x) -> a + x) AS d
       |  FROM embeddings e, cbl)""".stripMargin
  }

  private[ops] def fixedEncodeSql(salt: String, perm: String => String): String = {
    s"""${fixedDistCtes(salt, perm)},
       |best AS (
       |  SELECT vec_id, b, c, d, row_number() OVER (PARTITION BY vec_id, b ORDER BY d, c) AS rn
       |  FROM dist),
       |enc AS (
       |  SELECT vec_id,
       |    string_agg(c, ',' ORDER BY b) AS codes,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d ORDER BY b)), (a, x) -> a + x) AS err2
       |  FROM best WHERE rn = 1 GROUP BY vec_id)
       |SELECT vec_id, codes, round(sqrt(err2), 6) AS recon_err FROM enc ORDER BY vec_id""".stripMargin
  }

  /** DuckDB re-derivation of the FULL fixed-codebook PQ search
    * ([[encode]] → [[searchAdc]] pool → [[exactRerank]]) — every float
    * step mirrors the production kernels bit-for-bit: the ADC table for
    * query q IS its own `dist` rows (a query's per-(b, c) block distance
    * to every code is exactly the m×k table [[searchAdc]] precomputes);
    * the candidate score sums the 8 looked-up entries in block order
    * (list_reduce over ORDER BY b = the kernel's while-loop); the pool
    * rank reproduces `math.rint(s*1e6)/1e6` via round_even (verified
    * rint-identical on tie cases); the re-rank ranks FULL-precision
    * v·v − 2v·q + q·q, safe because list_dot_product and the native dot
    * kernel share left-to-right summation order.
    */
  private[ops] def fixedAnnSql(salt: String): String =
    s"""${fixedDistCtes(salt, identity)},
       |$annBodySql""".stripMargin

  /** The same full-search re-derivation reading the TRAINED codebook
    * from the [[OracleDump]] parquet instead of deriving the dyadic
    * one — the fitted model is the input (bit-exact: doubles round-trip
    * parquet losslessly), the encode → ADC pool → re-rank OPERATOR is
    * what the oracle checks. Same move as the trained-IVF centroid
    * dump (`IvfOps.trainedAnnSql`).
    */
  private def trainedAnnSql: String =
    s"""WITH cbl AS (
       |  SELECT b, c, cv FROM read_parquet('${OracleDump.path("pq_codebook")}')),
       |dist AS (
       |  SELECT e.vec_id, cbl.b, cbl.c,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (CAST(e.embedding[cbl.b * 8 + j + 1] AS DOUBLE) - cbl.cv[j + 1])
       |        * (CAST(e.embedding[cbl.b * 8 + j + 1] AS DOUBLE) - cbl.cv[j + 1]) FOR j IN range(0, 8) ]),
       |      (a, x) -> a + x) AS d
       |  FROM embeddings e, cbl),
       |$annBodySql""".stripMargin

  /** Codebook rows (b, c, cv) for the trained-PQ oracle dumps (shared
    * with the IVFADC/OPQ trained twins). */
  private[ops] def codebookDf(s: SparkSession, model: PqModel): DataFrame = {
    import s.implicits._
    (for { b <- 0 until model.m; c <- 0 until model.k }
      yield (b, c, model.codebooks(b)(c).toSeq)).toDF("b", "c", "cv")
  }

  /** Shared DuckDB back half of every PQ full-search twin: encode
    * argmin from `dist`, ADC pool over the 10 query vectors (a query's
    * per-(b, c) dist rows ARE its m×k ADC table), rint-identical pool
    * rounding, exact re-rank of the 30-candidate pool. Expects a
    * `dist(vec_id, b, c, d)` CTE in scope.
    */
  private def annBodySql: String = {
    """enc AS (
       |  SELECT vec_id, b, c FROM (
       |    SELECT vec_id, b, c, row_number() OVER (PARTITION BY vec_id, b ORDER BY d, c) AS rn FROM dist)
       |  WHERE rn = 1),
       |adist AS (
       |  SELECT qd.vec_id AS q_id, en.vec_id AS vec_id,
       |    round_even(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(qd.d ORDER BY qd.b)),
       |      (a, x) -> a + x) * 1000000.0, 0) / 1000000.0 AS adist
       |  FROM enc en JOIN dist qd ON qd.b = en.b AND qd.c = en.c
       |  WHERE qd.vec_id < 10 AND qd.vec_id <> en.vec_id
       |  GROUP BY qd.vec_id, en.vec_id),
       |pool AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS rn
       |    FROM adist)
       |  WHERE rn <= 30),
       |ed AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
       |rer AS (
       |  SELECT p.q_id, p.vec_id,
       |    list_dot_product(v.de, v.de) - 2.0 * list_dot_product(v.de, q.de)
       |      + list_dot_product(q.de, q.de) AS d2raw
       |  FROM pool p JOIN ed v ON v.vec_id = p.vec_id JOIN ed q ON q.vec_id = p.q_id)
       |SELECT q_id, vec_id, round(d2raw, 6) AS dist2, CAST(rn AS BIGINT) AS rank FROM (
       |  SELECT q_id, vec_id, d2raw,
       |    row_number() OVER (PARTITION BY q_id ORDER BY d2raw, vec_id) AS rn FROM rer)
       |WHERE rn <= 3 ORDER BY q_id, rank""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    // PQ encode through the production kernel under the FIXED dyadic
    // codebook — hash-oracled end to end (codes AND reconstruction
    // error). The trained-codebook path stays exercised by q_pq_ann and
    // PqSpec (float k-means keeps training off the oracle).
    QueryDef("q_pq_encode", fixedEncodeSql("pq", identity)) { (s, d) =>
      encodeReport(Tables.embeddings(s, d), fixedModel(dim = 64, m = 8, k = 16, salt = "pq"))
    },

    // The SAME production search kernels (encode → ADC pool → exact
    // re-rank) under the fixed dyadic codebook — the oracle twin of
    // q_pq_ann, extending q_pq_encode's coverage from the encode kernel
    // to the whole search path (the q_minhash_lsh_md5 move).
    QueryDef("q_pq_ann_md5", fixedAnnSql("pq")) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val model = fixedModel(dim = 64, m = 8, k = 16, salt = "pq")
      searchAdcRerank(encode(emb, model), emb,
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        model, topk = 3)
    },

    // PQ ADC + exact re-rank end-to-end: train, encode, candidate-pool
    // score 10 queries, re-rank the pool exactly. ORACLED since r8 via
    // the codebook dump (the trained-IVF centroid-dump move): training
    // is driver-side and bit-deterministic, the fitted codebook dumps
    // to parquet, and DuckDB re-derives encode → ADC → re-rank from it.
    QueryDef("q_pq_ann", trainedAnnSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val model = train(emb, m = 8, k = 16, iters = 6)
      OracleDump.write(codebookDf(s, model), d, "pq_codebook")
      val enc = encode(emb, model)
      searchAdcRerank(enc, emb,
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        model, topk = 3)
    })
}
