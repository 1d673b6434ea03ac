package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVFADC — the composed production ANN index (Jégou et al. '11, the
  * FAISS `IVFx,PQy` default): coarse IVF cells prune the corpus, PQ over
  * the RESIDUAL (vector − its cell centroid) compresses what remains.
  * Residual PQ beats raw PQ at equal bits because residuals live in a
  * much smaller ball than the vectors, so the same code budget spends
  * its resolution where the data actually is.
  *
  * Search: a query probes its `nprobe` nearest cells; for each probed
  * cell an ADC table is built from the query RESIDUAL against that cell
  * (q − c_cell, m×k block distances, driver-side — nprobe·m·k doubles);
  * candidates in probed cells are scored with m lookups each, and the
  * top pool is exactly re-ranked against the raw vectors.
  *
  * Scale shape: training (cells + residual codebooks) runs on the shared
  * bounded hash sample; the model broadcasts (nlist·dim + m·k·subdim
  * doubles); encode is one broadcast pass; search shuffles nothing on
  * the corpus side (per-query tables broadcast, candidates filtered by
  * cell membership). Float k-means keeps it off the hash oracle —
  * IvfAdcSpec pins recall and the residual-vs-raw compression win.
  */
object IvfAdcOps {

  final case class IvfAdcModel(
      centroids: Array[Array[Double]],
      pq: PqOps.PqModel)

  final case class AdcEncoded(vec_id: Long, cluster: Int, codes: Array[Int], recon_err2: Double)

  private[graft] def sub(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) - b(i); i += 1 }
    out
  }

  private[graft] def argminL2(e: Array[Double], cents: Array[Array[Double]]): (Int, Double) = {
    var best = 0; var bd = Double.MaxValue; var c = 0
    while (c < cents.length) {
      var s = 0.0; var i = 0
      val cc = cents(c)
      while (i < e.length) { val d = e(i) - cc(i); s += d * d; i += 1 }
      if (s < bd) { bd = s; best = c }
      c += 1
    }
    (best, bd)
  }

  /** Train coarse cells + residual PQ codebooks on the shared
    * deterministic hash sample.
    */
  def train(emb: DataFrame, nlist: Int, m: Int, k: Int = 256, iters: Int = 8,
      maxSample: Int = KMeans.DefaultMaxSample): IvfAdcModel = {
    val pts = KMeans.samplePoints(emb, maxSample)
    require(pts.nonEmpty, "IVFADC training sample is empty")
    val coarse = KMeans.fitArrays(pts, nlist, iters).centroids
    // residuals of the SAME sample under the trained cells
    val residuals = pts.map { p => sub(p, coarse(argminL2(p, coarse)._1)) }
    val dim = pts(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m blocks")
    val subdim = dim / m
    val books = (0 until m).toArray.map { b =>
      val block = residuals.map(r => java.util.Arrays.copyOfRange(r, b * subdim, (b + 1) * subdim))
      KMeans.fitArrays(block, k, iters).centroids
    }
    IvfAdcModel(coarse, PqOps.PqModel(books))
  }

  /** Encode every vector: its cell + PQ codes of its residual.
    * `residualTransform` (cell, residual) → quantization-space vector
    * is the hook LocalOpqOps uses for per-cell rotations; identity for
    * plain IVFADC. Must be an isometry per cell or ADC distances stop
    * meaning L2.
    */
  def encode(
      emb: DataFrame, model: IvfAdcModel,
      residualTransform: (Int, Array[Double]) => Array[Double] = (_, r) => r)
      : Dataset[AdcEncoded] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((model, residualTransform))
    emb.select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("e"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val (mod, tf) = bc.value
        val sd = mod.pq.subdim
        it.map { case (id, eSeq) =>
          val e = eSeq.toArray
          val (cell, _) = argminL2(e, mod.centroids)
          val r = tf(cell, sub(e, mod.centroids(cell)))
          val codes = new Array[Int](mod.pq.m)
          var err = 0.0
          var b = 0
          while (b < mod.pq.m) {
            val block = java.util.Arrays.copyOfRange(r, b * sd, (b + 1) * sd)
            val (code, d) = argminL2(block, mod.pq.codebooks(b))
            codes(b) = code; err += d; b += 1
          }
          AdcEncoded(id, cell, codes, err)
        }
      }
  }

  /** IVFADC search with exact re-rank: probe `nprobe` cells, ADC-score
    * their members from per-(query, cell) residual tables, exactly
    * re-rank the top `poolSize` candidates. Returns
    * (q_id, vec_id, dist2, rank).
    */
  def search(
      encoded: Dataset[AdcEncoded],
      emb: DataFrame,
      queries: DataFrame, // (q_id, embedding)
      model: IvfAdcModel,
      topk: Int,
      nprobe: Int,
      poolSize: Int = 0,
      residualTransform: (Int, Array[Double]) => Array[Double] = (_, r) => r): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val pool = if (poolSize > 0) poolSize else 10 * topk
    val qs = queries
      .select(col("q_id"), transform(col("embedding"), _.cast(DoubleType)).as("e"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // per query: nprobe nearest cells, and per probed cell an ADC table
    // over the query residual (q - c_cell)
    val probes = qs.map { case (qid, q) =>
      val byCell = model.centroids.indices
        .map(c => c -> {
          var s = 0.0; var i = 0
          while (i < q.length) { val d = q(i) - model.centroids(c)(i); s += d * d; i += 1 }
          s
        })
        .sortBy { case (c, d) => (d, c) }.take(nprobe).map(_._1)
      val tables = byCell.map { c =>
        val r = residualTransform(c, sub(q, model.centroids(c)))
        val t = Array.ofDim[Double](model.pq.m, model.pq.k)
        var b = 0
        while (b < model.pq.m) {
          var cd = 0
          while (cd < model.pq.k) {
            val book = model.pq.codebooks(b)(cd)
            var s = 0.0; var i = 0
            while (i < book.length) {
              val d = r(b * model.pq.subdim + i) - book(i); s += d * d; i += 1
            }
            t(b)(cd) = s; cd += 1
          }
          b += 1
        }
        c -> t
      }.toMap
      (qid, tables)
    }
    val bc = spark.sparkContext.broadcast(probes)
    val scored = encoded.mapPartitions { it =>
      val ps = bc.value
      it.flatMap { enc =>
        ps.iterator.flatMap { case (qid, tables) =>
          tables.get(enc.cluster).map { t =>
            var s = 0.0; var b = 0
            while (b < enc.codes.length) { s += t(b)(enc.codes(b)); b += 1 }
            (qid, enc.vec_id, s)
          }
        }
      }
    }.toDF("q_id", "vec_id", "adist")
      .filter(col("q_id") =!= col("vec_id"))
    val wPool = Window.partitionBy(col("q_id")).orderBy(col("adist").asc, col("vec_id").asc)
    val cand = scored
      .withColumn("prank", row_number().over(wPool))
      .filter(col("prank") <= pool)
      .select("q_id", "vec_id")
    // shared exact re-rank (full-precision ranking — see PqOps.exactRerank)
    PqOps.exactRerank(cand, emb, queries, topk)
  }

  /** Deterministic stand-in model for the oracle twins: coarse cells =
    * the first `nlist` embeddings (the q_ivf_assign convention — DuckDB
    * reads them straight off the table), residual codebooks = the
    * md5-dyadic [[PqOps.fixedModel]]. Training stays the production
    * path ([[train]]); this pins the encode/probe/ADC/re-rank KERNELS
    * to the hash oracle.
    */
  def fixedModel(emb: DataFrame, nlist: Int, salt: String): IvfAdcModel = {
    val cents = emb.filter(col("vec_id") < nlist)
      .select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("e"))
      .orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray) // nlist×dim doubles — bounded
    require(cents.length == nlist, s"expected $nlist centroid rows, got ${cents.length}")
    IvfAdcModel(cents, PqOps.fixedModel(dim = 64, m = 8, k = 16, salt = salt))
  }

  /** DuckDB re-derivation of the FULL fixed-model IVFADC search
    * ([[encode]] → probe → residual-ADC pool → exact re-rank). Every
    * float step mirrors the production kernels bit-for-bit (sequential
    * folds in dimension/block order, raw-double pool rank exactly as
    * the kernel ranks, lowest-id tie-breaks everywhere).
    *
    * `evIdx(i)` maps logical (possibly rotated) dimension i to the raw
    * embedding index — identity for plain IVFADC, a stride permutation
    * for the global-OPQ twin. `residIdx(cell, i)` maps residual
    * dimension i within `cell` — identity except for the local-OPQ
    * twin's per-cell stride permutation. Both permutations are
    * float-exact (plain copies), so the composition stays on the
    * oracle.
    */
  private[ops] def fixedAnnSql(
      salt: String,
      evIdx: String => String,
      residIdx: (String, String) => String): String = {
    s"""WITH cb AS (
       |  SELECT b, c, j,
       |    CAST(CAST(('0x' || substring(md5('$salt:' || b || ':' || c || ':' || j), 1, 13)) AS BIGINT)
       |      AS DOUBLE) / 4503599627370496.0 - 0.5 AS v
       |  FROM generate_series(0, 7) AS gb(b), generate_series(0, 15) AS gc(c), generate_series(0, 7) AS gj(j)),
       |cbl AS (SELECT b, c, list(v ORDER BY j) AS cv FROM cb GROUP BY b, c),
       |ev AS (
       |  SELECT vec_id,
       |    [ CAST(embedding[${evIdx("i")} + 1] AS DOUBLE) FOR i IN range(0, 64) ] AS de
       |  FROM embeddings),
       |cent AS (SELECT vec_id AS cid, de AS ce FROM ev WHERE vec_id < 16),
       |${annBodySql(residIdx)}""".stripMargin
  }

  /** The same full-search re-derivation over DUMPED trained models
    * ([[OracleDump]]): coarse centroids (cid, ce) and residual codebook
    * (b, c, cv) are parquet inputs, the encode → probe → residual-ADC
    * pool → re-rank OPERATOR is what the oracle checks — the
    * trained-twin move shared with `PqOps.trainedAnnSql`. `centName` /
    * `cbName` parametrize the dump so the OPQ trained twins reuse it.
    */
  private[ops] def trainedAnnSql(
      centName: String, cbName: String,
      evCte: String = "ev AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings)")
      : String =
    s"""WITH cbl AS (
       |  SELECT b, c, cv FROM read_parquet('${OracleDump.path(cbName)}')),
       |$evCte,
       |cent AS (SELECT cid, ce FROM read_parquet('${OracleDump.path(centName)}')),
       |${annBodySql(identResidIdx)}""".stripMargin

  /** Centroid rows (cid, ce) for the trained-IVFADC oracle dumps. */
  private[ops] def centroidDf(
      s: org.apache.spark.sql.SparkSession, cents: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    cents.zipWithIndex.map { case (ce, cid) => (cid.toLong, ce.toSeq) }
      .toSeq.toDF("cid", "ce")
  }

  /** Shared DuckDB back half of every IVFADC twin (fixed or trained):
    * expects `cbl(b, c, cv)`, `ev(vec_id, de)`, `cent(cid, ce)` CTEs in
    * scope; derives assignment, residual encode, probes, per-(query,
    * cell) residual ADC tables, raw-double pool rank, exact re-rank.
    */
  private def annBodySql(residIdx: (String, String) => String): String = {
    def rterm(cell: String): String = {
      val p = residIdx(cell, "(cbl.b * 8 + j)")
      s"((ev.de[$p + 1] - ct.ce[$p + 1]) - cbl.cv[j + 1])"
    }
    s"""$cdAsgProbeSql,
       |rdist AS (
       |  SELECT ev.vec_id, a.cell, cbl.b, cbl.c,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ ${rterm("a.cell")} * ${rterm("a.cell")} FOR j IN range(0, 8) ]),
       |      (acc, x) -> acc + x) AS d
       |  FROM ev JOIN asg a ON a.vec_id = ev.vec_id JOIN cent ct ON ct.cid = a.cell, cbl),
       |enc AS (
       |  SELECT vec_id, cell, b, c FROM (
       |    SELECT vec_id, cell, b, c, row_number() OVER (PARTITION BY vec_id, b ORDER BY d, c) AS rn
       |    FROM rdist)
       |  WHERE rn = 1),
       |qtab AS (
       |  SELECT p.q_id, p.cell, cbl.b, cbl.c,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ ${rterm("p.cell")} * ${rterm("p.cell")} FOR j IN range(0, 8) ]),
       |      (acc, x) -> acc + x) AS t
       |  FROM probe p JOIN ev ON ev.vec_id = p.q_id JOIN cent ct ON ct.cid = p.cell, cbl),
       |$poolFinalSql""".stripMargin
  }

  /** Front fragment shared with the local-OPQ trained twin: corpus/cell
    * distances, assignment, query probes. Expects `ev`, `cent` CTEs. */
  private[ops] def cdAsgProbeSql: String =
    """cd AS (
      |  SELECT ev.vec_id, cent.cid,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      [ (ev.de[i + 1] - cent.ce[i + 1]) * (ev.de[i + 1] - cent.ce[i + 1]) FOR i IN range(0, 64) ]),
      |      (a, x) -> a + x) AS d
      |  FROM ev, cent),
      |asg AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM cd)
      |  WHERE rn = 1),
      |probe AS (
      |  SELECT vec_id AS q_id, cid AS cell FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
      |    FROM cd WHERE vec_id < 10)
      |  WHERE rn <= 4)""".stripMargin

  /** Back fragment shared with the local-OPQ trained twin: ADC sums in
    * block order, raw-double 30-pool, exact re-rank, final projection.
    * Expects `enc(vec_id, cell, b, c)`, `qtab(q_id, cell, b, c, t)`,
    * `ev` CTEs. */
  private[ops] def poolFinalSql: String =
    """adist AS (
      |  SELECT qt.q_id, en.vec_id,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(qt.t ORDER BY qt.b)),
      |      (a, x) -> a + x) AS adist
      |  FROM enc en JOIN qtab qt ON qt.cell = en.cell AND qt.b = en.b AND qt.c = en.c
      |  WHERE qt.q_id <> en.vec_id
      |  GROUP BY qt.q_id, en.vec_id),
      |pool AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY adist, vec_id) AS rn
      |    FROM adist)
      |  WHERE rn <= 30),
      |rer AS (
      |  SELECT p.q_id, p.vec_id,
      |    list_dot_product(v.de, v.de) - 2.0 * list_dot_product(v.de, q.de)
      |      + list_dot_product(q.de, q.de) AS d2raw
      |  FROM pool p JOIN ev v ON v.vec_id = p.vec_id JOIN ev q ON q.vec_id = p.q_id)
      |SELECT q_id, vec_id, round(d2raw, 6) AS dist2, CAST(rn AS BIGINT) AS rank FROM (
      |  SELECT q_id, vec_id, d2raw,
      |    row_number() OVER (PARTITION BY q_id ORDER BY d2raw, vec_id) AS rn FROM rer)
      |WHERE rn <= 3 ORDER BY q_id, rank""".stripMargin

  private[ops] val identIdx: String => String = i => s"($i)"
  private[ops] val identResidIdx: (String, String) => String = (_, i) => s"($i)"

  val all: Seq[QueryDef] = Seq(
    // The SAME production kernels (encode → probe → residual-ADC pool →
    // exact re-rank) under the fixed stand-in model — the oracle twin
    // of q_ivfadc_ann.
    QueryDef("q_ivfadc_ann_md5", fixedAnnSql("ivfadc", identIdx, identResidIdx)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val model = fixedModel(emb, nlist = 16, salt = "ivfadc")
      search(encode(emb, model), emb,
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        model, topk = 3, nprobe = 4)
    },

    // end-to-end composed index over the driver embeddings. ORACLED
    // since r8 via the model dump (centroids + residual codebook —
    // training is driver-side and bit-deterministic, doubles round-trip
    // parquet losslessly); IvfAdcSpec keeps the recall verification.
    QueryDef("q_ivfadc_ann", trainedAnnSql("ivfadc_cents", "ivfadc_codebook")) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val model = train(emb, nlist = 16, m = 8, k = 16, iters = 6)
      OracleDump.write(centroidDf(s, model.centroids), d, "ivfadc_cents")
      OracleDump.write(PqOps.codebookDf(s, model.pq), d, "ivfadc_codebook")
      val enc = encode(emb, model)
      search(enc, emb,
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        model, topk = 3, nprobe = 4)
    })
}
