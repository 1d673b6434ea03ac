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

  private[ops] def sub(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) - b(i); i += 1 }
    out
  }

  private[ops] def argminL2(e: Array[Double], cents: Array[Array[Double]]): (Int, Double) = {
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

  val all: Seq[QueryDef] = Seq(
    // end-to-end composed index over the driver embeddings (trained
    // float models — IvfAdcSpec carries the verification)
    QueryDef.noOracle("q_ivfadc_ann") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val model = train(emb, nlist = 16, m = 8, k = 16, iters = 6)
      val enc = encode(emb, model)
      search(enc, emb,
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        model, topk = 3, nprobe = 4)
    })
}
