package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Optimized product quantization (Ge et al. CVPR'13, parametric
  * variant; FAISS "OPQ" pre-transform): learn an ORTHOGONAL rotation
  * that decorrelates dimensions and balances variance across the m PQ
  * blocks, then quantize in the rotated space. Plain PQ slices raw
  * dimension order — when dimensions are correlated (real embedding
  * models, unlike the driver's isotropic corpus) a few blocks carry most
  * of the variance and burn their k codes on it; rotating first spends
  * every block's codebook where the variance actually is, cutting
  * reconstruction error at identical bit budget. Rotation is
  * L2-isometric, so search semantics are unchanged: rotate the query,
  * search rotated codes, distances are THE SAME distances.
  *
  * Scale shape — identical to PQ's: training is driver-side over the
  * bounded hash sample (covariance d×d = 64×64 here, Jacobi eigen in
  * microseconds); the (mean, rotation, codebooks) model broadcasts; the
  * corpus-side rotate+encode is ONE map-shaped pass (mapPartitions,
  * tight JVM loops, no shuffle). Float training keeps it off the DuckDB
  * hash oracle; OpqSpec pins the contracts (orthogonality, isometry,
  * error vs plain PQ on correlated data).
  */
object OpqOps {

  /** `rot(i)(j)` = component i of output dimension j (columns are the
    * permuted eigenvectors). Rotated vector: y_j = Σ_i rot(i)(j) * (x_i - mean_i).
    */
  final case class OpqModel(
      mean: Array[Double],
      rot: Array[Array[Double]],
      pq: PqOps.PqModel)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvectors-as-columns): a ≈ V diag(λ) Vᵀ. O(d³)
    * per sweep — fine for embedding dims (d ≤ a few hundred), always on
    * the DRIVER over the d×d covariance, never over data.
    */
  private[ops] def jacobiEigen(
      aIn: Array[Array[Double]],
      maxSweeps: Int = 64,
      tol: Double = 1e-18): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            // symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Greedy eigenvalue balancing (the FAISS OPQ allocation): walk
    * eigenvectors by descending λ, placing into the block with the
    * smallest Σ log λ — every block ends with a comparable variance
    * product, so no codebook is starved.
    *
    * Candidates are restricted to blocks with the FEWEST assignments so
    * far (level-by-level fill): with the raw min-log-sum rule, λ < 1
    * (log λ < 0) makes the just-filled block the minimum again, and the
    * allocation degenerates to "largest d/m eigenvalues all in block
    * 0" — the exact concentration this function exists to prevent.
    * Unit-scale embeddings (per-dim variance ≪ 1) hit that regime.
    */
  private[ops] def allocateBlocks(eigVals: Array[Double], m: Int): Array[Int] = {
    val d = eigVals.length
    val sub = d / m
    val order = eigVals.indices.sortBy(i => -eigVals(i))
    val blockLog = new Array[Double](m)
    val blockN = new Array[Int](m)
    val slots = Array.fill(d)(-1)
    order.foreach { e =>
      val minN = blockN.min
      var best = -1; var bestLog = Double.MaxValue
      var b = 0
      while (b < m) {
        if (blockN(b) == minN && blockN(b) < sub && blockLog(b) < bestLog) {
          bestLog = blockLog(b); best = b
        }
        b += 1
      }
      slots(best * sub + blockN(best)) = e
      blockN(best) += 1
      blockLog(best) += math.log(math.max(eigVals(e), 1e-300))
    }
    slots
  }

  /** A learned orthogonal pre-rotation, decoupled from the codebooks so
    * it composes with ANY downstream index (plain PQ here, IVFADC via
    * [[ivfadcRotated]]).
    */
  final case class Rotation(mean: Array[Double], rot: Array[Array[Double]])

  /** Train: sample (same hash convention as IVF/PQ), mean+covariance,
    * Jacobi eigen, balanced allocation → rotation; PQ codebooks on the
    * rotated sample.
    */
  def train(emb: DataFrame, m: Int, k: Int = 256, iters: Int = 8,
      maxSample: Int = KMeans.DefaultMaxSample): OpqModel = {
    val pts = KMeans.samplePoints(emb, maxSample)
    val r = trainRotationPts(pts, m)
    val rotated = pts.map(p => rotateOne(p, r.mean, r.rot))
    OpqModel(r.mean, r.rot, PqOps.trainArrays(rotated, m, k, iters))
  }

  /** Rotation-only training on the shared hash sample. */
  def trainRotation(emb: DataFrame, m: Int,
      maxSample: Int = KMeans.DefaultMaxSample): Rotation =
    trainRotationPts(KMeans.samplePoints(emb, maxSample), m)

  private[graft] def trainRotationPts(pts: Array[Array[Double]], m: Int): Rotation = {
    require(pts.nonEmpty, "OPQ training sample is empty")
    val d = pts(0).length
    require(d % m == 0, s"dim $d not divisible into $m blocks")
    val n = pts.length
    val mean = new Array[Double](d)
    pts.foreach { p => var i = 0; while (i < d) { mean(i) += p(i); i += 1 } }
    var i = 0; while (i < d) { mean(i) /= n; i += 1 }
    val cov = Array.ofDim[Double](d, d)
    pts.foreach { p =>
      var a = 0
      while (a < d) {
        val da = p(a) - mean(a)
        var b = a
        while (b < d) { cov(a)(b) += da * (p(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        cov(i)(j) /= math.max(n - 1, 1)
        cov(j)(i) = cov(i)(j)
        j += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val slots = allocateBlocks(eigVals, m)
    // column j of the rotation = eigenvector slots(j)
    val rot = Array.tabulate(d, d)((r, j) => eigVecs(r)(slots(j)))
    Rotation(mean, rot)
  }

  private[graft] def rotateOne(
      x: Array[Double], mean: Array[Double], rot: Array[Array[Double]]): Array[Double] = {
    val d = x.length
    val y = new Array[Double](d)
    var i = 0
    while (i < d) {
      val xi = x(i) - mean(i)
      if (xi != 0.0) {
        val row = rot(i)
        var j = 0
        while (j < d) { y(j) += xi * row(j); j += 1 }
      }
      i += 1
    }
    y
  }

  /** Rotate the corpus (one map-shaped pass, broadcast model) —
    * returns (vec_id, embedding) with the rotated vector, ready for
    * [[PqOps.encode]] or any downstream ANN stage. Any extra columns of
    * `emb` beyond (vec_id, embedding) are dropped.
    */
  def rotate(emb: DataFrame, r: Rotation): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((r.mean, r.rot))
    emb.select(col("vec_id"), transform(col("embedding"), _.cast(DoubleType)).as("e"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val (mean, rot) = bc.value
        it.map { case (id, e) => (id, rotateOne(e.toArray, mean, rot).toSeq) }
      }
      .toDF("vec_id", "embedding")
  }

  def rotate(emb: DataFrame, model: OpqModel): DataFrame =
    rotate(emb, Rotation(model.mean, model.rot))

  /** Rotate + PQ-encode in one pass pair. */
  def encode(emb: DataFrame, model: OpqModel): Dataset[PqOps.Encoded] =
    PqOps.encode(rotate(emb, model), model.pq)

  /** The fully composed production index: OPQ rotation → IVF cells →
    * residual PQ → ADC search → exact re-rank, all in the ROTATED
    * space. The rotation is an isometry, so the exact re-rank's
    * distances (and therefore ranks) equal the original-space L2 —
    * the rotation only changes how well the codebooks spend their
    * bits, never what the index returns after re-ranking.
    *
    * `queries` = (q_id, embedding) in the ORIGINAL space; rotated with
    * the same model before probing.
    */
  def ivfadcRotated(
      emb: DataFrame,
      queries: DataFrame,
      r: Rotation,
      nlist: Int, m: Int, k: Int, iters: Int,
      topk: Int, nprobe: Int): DataFrame = {
    val rotated = rotate(emb, r)
    val rotatedQ = rotate(queries.select(col("q_id").as("vec_id"), col("embedding")), r)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val model = IvfAdcOps.train(rotated, nlist, m, k, iters)
    IvfAdcOps.search(IvfAdcOps.encode(rotated, model), rotated, rotatedQ, model, topk, nprobe)
  }

  /** Local OPQ (Ge et al. CVPR'13 §5, "OPQ per cell"; FAISS
    * multi-OPQ): one learned rotation PER coarse cell over that cell's
    * RESIDUALS, with shared PQ codebooks trained in the rotated space.
    * A global rotation optimizes the AVERAGE residual covariance;
    * when cells have heterogeneous local structure (different dominant
    * directions per region of the space — typical of real embedding
    * manifolds) each cell's own rotation aligns ITS variance with the
    * block structure. Each per-cell map is still an isometry, so ADC
    * distances remain L2 and the exact re-rank contract is unchanged.
    *
    * Scale shape identical to IVFADC: training driver-side on the
    * bounded hash sample (nlist d×d eigenproblems), the model
    * broadcasts (+ nlist·d² doubles over the global variant), encode
    * and search reuse the IVFADC passes via the residual-transform
    * hook — nothing new shuffles.
    */
  final case class LocalOpqModel(
      ivf: IvfAdcOps.IvfAdcModel,
      rotations: Array[Rotation])

  private def identityRotation(d: Int): Rotation =
    Rotation(new Array[Double](d), Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0))

  /** Cells whose sample is thinner than `minCellSample` keep the
    * identity rotation (a covariance from 2–3 points is noise).
    */
  def trainLocal(emb: DataFrame, nlist: Int, m: Int, k: Int = 256, iters: Int = 8,
      maxSample: Int = KMeans.DefaultMaxSample, minCellSample: Int = 8): LocalOpqModel = {
    val pts = KMeans.samplePoints(emb, maxSample)
    require(pts.nonEmpty, "local OPQ training sample is empty")
    val d = pts(0).length
    require(d % m == 0, s"dim $d not divisible into $m blocks")
    val coarse = KMeans.fitArrays(pts, nlist, iters).centroids
    val byCell = pts.groupBy(p => IvfAdcOps.argminL2(p, coarse)._1)
    val identity = identityRotation(d)
    val rotations = Array.tabulate(coarse.length) { c =>
      byCell.get(c) match {
        case Some(cell) if cell.length >= minCellSample =>
          trainRotationPts(cell.map(p => IvfAdcOps.sub(p, coarse(c))), m)
        case _ => identity
      }
    }
    val rotated = byCell.toArray.sortBy(_._1).flatMap { case (c, cell) =>
      cell.map(p => rotateOne(IvfAdcOps.sub(p, coarse(c)), rotations(c).mean, rotations(c).rot))
    }
    LocalOpqModel(
      IvfAdcOps.IvfAdcModel(coarse, PqOps.trainArrays(rotated, m, k, iters)), rotations)
  }

  /** The per-cell residual transform for IvfAdcOps' encode/search hook. */
  def localTransform(model: LocalOpqModel): (Int, Array[Double]) => Array[Double] = {
    val rots = model.rotations
    (c, r) => rotateOne(r, rots(c).mean, rots(c).rot)
  }

  def encodeLocal(emb: DataFrame, model: LocalOpqModel): Dataset[IvfAdcOps.AdcEncoded] =
    IvfAdcOps.encode(emb, model.ivf, localTransform(model))

  def searchLocal(
      encoded: Dataset[IvfAdcOps.AdcEncoded],
      emb: DataFrame, queries: DataFrame, model: LocalOpqModel,
      topk: Int, nprobe: Int, poolSize: Int = 0): DataFrame =
    IvfAdcOps.search(encoded, emb, queries, model.ivf, topk, nprobe, poolSize,
      localTransform(model))

  /** A FIXED orthogonal rotation for the oracle-checkable encode path:
    * the stride-`s` dimension permutation (y_j = x_{(s·j) mod d}, s
    * coprime to d). A permutation matrix is a genuine orthogonal OPQ
    * pre-transform (isometric, block-reshuffling) whose application is
    * float-exact — each output coordinate is a plain copy — so the
    * rotate→encode composition stays bit-reproducible in DuckDB.
    * Learned rotations (dense eigenvector matrices) remain the
    * production path (q_opq_ivfadc_ann / q_local_opq_ann + OpqSpec).
    */
  def fixedPermutationRotation(dim: Int, stride: Int = 17): Rotation = {
    require(BigInt(stride).gcd(BigInt(dim)) == 1, s"stride $stride must be coprime to $dim")
    Rotation(
      new Array[Double](dim),
      Array.tabulate(dim, dim)((i, j) => if (i == (stride * j) % dim) 1.0 else 0.0))
  }

  /** Rotation rows (i, mean, rv) for the trained-OPQ oracle dump:
    * rv = row i of the rotation (y_j accumulates (x_i − mean_i)·rv(j)
    * over ascending i — the exact [[rotateOne]] fold order DuckDB
    * replays with `list(xi * rv[j+1] ORDER BY i)`). */
  private def rotationDf(
      s: org.apache.spark.sql.SparkSession, r: Rotation): DataFrame = {
    import s.implicits._
    r.rot.indices.map(i => (i.toLong, r.mean(i), r.rot(i).toSeq))
      .toDF("i", "mean", "rv")
  }

  /** Per-cell rotation rows (cell, i, mean, rv) for the local-OPQ dump. */
  private def localRotationsDf(
      s: org.apache.spark.sql.SparkSession, rots: Array[Rotation]): DataFrame = {
    import s.implicits._
    (for { c <- rots.indices; i <- rots(c).rot.indices }
      yield (c.toLong, i.toLong, rots(c).mean(i), rots(c).rot(i).toSeq))
      .toDF("cell", "i", "mean", "rv")
  }

  /** Trained-OPQ oracle: the dumped dense rotation is applied by DuckDB
    * itself (a 64×64 matvec per vector, ascending-i fold = the kernel's
    * accumulation order — the skipped xi == 0 terms add an exact ±0.0,
    * a no-op under IEEE round-to-nearest since the accumulator starts
    * at +0.0), producing the rotated corpus CTE the shared IVFADC
    * derivation then runs on with the dumped rotated-space model.
    */
  private def trainedOpqAnnSql: String = {
    val evCte =
      s"""rot AS (SELECT i, mean, rv FROM read_parquet('${OracleDump.path("opq_rotation")}')),
         |xm AS (
         |  SELECT e.vec_id, r.i, (CAST(e.embedding[r.i + 1] AS DOUBLE) - r.mean) AS xi, r.rv
         |  FROM embeddings e, rot r),
         |yv AS (
         |  SELECT vec_id, j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(xi * rv[j + 1] ORDER BY i)),
         |      (a, x) -> a + x) AS y
         |  FROM xm, (SELECT unnest(range(0, 64)) AS j) jj
         |  GROUP BY vec_id, j),
         |ev AS (SELECT vec_id, list(y ORDER BY j) AS de FROM yv GROUP BY vec_id)""".stripMargin
    IvfAdcOps.trainedAnnSql("opq_ivfadc_cents", "opq_ivfadc_codebook", evCte)
  }

  /** Trained local-OPQ oracle: raw-space assignment/probes (the shared
    * front fragment), then per-(vector, cell) residuals pushed through
    * THAT cell's dumped rotation (dense matvec, same fold-order
    * argument as [[trainedOpqAnnSql]]; thin cells dumped the identity),
    * PQ-encoded against the dumped shared codebook, ADC-pooled and
    * exactly re-ranked in the RAW space (per-cell isometries keep ADC
    * distances L2, and `searchLocal` re-ranks against raw vectors).
    */
  private def localTrainedAnnSql: String =
    s"""WITH cbl AS (SELECT b, c, cv FROM read_parquet('${OracleDump.path("lopq_codebook")}')),
       |ev AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
       |cent AS (SELECT cid, ce FROM read_parquet('${OracleDump.path("lopq_cents")}')),
       |lrot AS (SELECT cell, i, mean, rv FROM read_parquet('${OracleDump.path("lopq_rotations")}')),
       |${IvfAdcOps.cdAsgProbeSql},
       |vc AS (
       |  SELECT vec_id, cell FROM asg
       |  UNION
       |  SELECT q_id AS vec_id, cell FROM probe),
       |tres AS (
       |  SELECT vc.vec_id, vc.cell, j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list((ev.de[lr.i + 1] - ct.ce[lr.i + 1] - lr.mean) * lr.rv[j + 1] ORDER BY lr.i)),
       |      (a, x) -> a + x) AS t
       |  FROM vc JOIN ev ON ev.vec_id = vc.vec_id JOIN cent ct ON ct.cid = vc.cell
       |    JOIN lrot lr ON lr.cell = vc.cell, (SELECT unnest(range(0, 64)) AS j) jj
       |  GROUP BY vc.vec_id, vc.cell, j),
       |trv AS (SELECT vec_id, cell, list(t ORDER BY j) AS tr FROM tres GROUP BY vec_id, cell),
       |rdist AS (
       |  SELECT a.vec_id, a.cell, cbl.b, cbl.c,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (tv.tr[cbl.b * 8 + j + 1] - cbl.cv[j + 1]) * (tv.tr[cbl.b * 8 + j + 1] - cbl.cv[j + 1]) FOR j IN range(0, 8) ]),
       |      (acc, x) -> acc + x) AS d
       |  FROM asg a JOIN trv tv ON tv.vec_id = a.vec_id AND tv.cell = a.cell, cbl),
       |enc AS (
       |  SELECT vec_id, cell, b, c FROM (
       |    SELECT vec_id, cell, b, c, row_number() OVER (PARTITION BY vec_id, b ORDER BY d, c) AS rn
       |    FROM rdist)
       |  WHERE rn = 1),
       |qtab AS (
       |  SELECT p.q_id, p.cell, cbl.b, cbl.c,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (tv.tr[cbl.b * 8 + j + 1] - cbl.cv[j + 1]) * (tv.tr[cbl.b * 8 + j + 1] - cbl.cv[j + 1]) FOR j IN range(0, 8) ]),
       |      (acc, x) -> acc + x) AS t
       |  FROM probe p JOIN trv tv ON tv.vec_id = p.q_id AND tv.cell = p.cell, cbl),
       |${IvfAdcOps.poolFinalSql}""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // Rotate (fixed permutation) + PQ-encode (fixed dyadic codebook,
    // salt "opq") through the production kernels — hash-oracled: the
    // DuckDB twin reads the permuted embedding index directly. Float
    // TRAINING stays off the oracle (q_opq_ivfadc_ann + OpqSpec).
    QueryDef(
      "q_opq_encode",
      PqOps.fixedEncodeSql("opq", i => s"((17 * $i) % 64)")) { (s, d) =>
      PqOps.encodeReport(
        rotate(Tables.embeddings(s, d), fixedPermutationRotation(64)),
        PqOps.fixedModel(dim = 64, m = 8, k = 16, salt = "opq"))
    },

    // The full composed OPQ→IVFADC stack through the SAME production
    // kernels under fixed models: stride-17 permutation rotation (a
    // float-exact orthogonal transform), first-16-rotated-vectors
    // coarse cells, md5-dyadic residual codebooks. The oracle twin of
    // q_opq_ivfadc_ann — DuckDB replays the whole pipeline reading the
    // permuted embedding index directly.
    QueryDef(
      "q_opq_ivfadc_ann_md5",
      IvfAdcOps.fixedAnnSql("opq", i => s"((17 * ($i)) % 64)", IvfAdcOps.identResidIdx)) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val r = fixedPermutationRotation(64)
        val rotated = rotate(emb, r)
        val rotQ = rotate(emb.filter(col("vec_id") < 10), r)
          .select(col("vec_id").as("q_id"), col("embedding"))
        val model = IvfAdcOps.fixedModel(rotated, nlist = 16, salt = "opq")
        IvfAdcOps.search(IvfAdcOps.encode(rotated, model), rotated, rotQ, model,
          topk = 3, nprobe = 4)
    },

    // Local OPQ through the SAME production kernels under fixed models:
    // per-cell stride-(2c+1) permutation rotations (each a float-exact
    // isometry of the cell's residual space), first-16 coarse cells,
    // md5-dyadic shared codebooks. The oracle twin of q_local_opq_ann.
    QueryDef(
      "q_local_opq_ann_md5",
      IvfAdcOps.fixedAnnSql("lopq", IvfAdcOps.identIdx,
        (cell, i) => s"(((2 * $cell + 1) * ($i)) % 64)")) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val model = LocalOpqModel(
        IvfAdcOps.fixedModel(emb, nlist = 16, salt = "lopq"),
        Array.tabulate(16)(c => fixedPermutationRotation(64, stride = 2 * c + 1)))
      searchLocal(encodeLocal(emb, model), emb,
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        model, topk = 3, nprobe = 4)
    },

    // The full composed stack end-to-end (rotation + IVF + residual PQ
    // + exact re-rank); OpqSpec proves re-ranked results equal the
    // UNROTATED index's (isometry) and the codebook-efficiency win.
    // ORACLED since r8 via the model dump: rotation + rotated-space
    // IVFADC model are parquet inputs; DuckDB applies the rotation
    // itself and replays the whole composed search.
    QueryDef("q_opq_ivfadc_ann", trainedOpqAnnSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val r = trainRotation(emb, m = 8)
      // inlined [[ivfadcRotated]] so the trained model is in scope to
      // dump — plan and semantics identical
      val rotated = rotate(emb, r)
      val rotQ = rotate(
        emb.filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding")), r)
        .select(col("vec_id").as("q_id"), col("embedding"))
      val model = IvfAdcOps.train(rotated, nlist = 16, m = 8, k = 16, iters = 6)
      OracleDump.write(rotationDf(s, r), d, "opq_rotation")
      OracleDump.write(IvfAdcOps.centroidDf(s, model.centroids), d, "opq_ivfadc_cents")
      OracleDump.write(PqOps.codebookDf(s, model.pq), d, "opq_ivfadc_codebook")
      IvfAdcOps.search(IvfAdcOps.encode(rotated, model), rotated, rotQ, model,
        topk = 3, nprobe = 4)
    },

    // Per-cell rotations (local OPQ) end-to-end; LocalOpqSpec proves
    // the per-cell isometry (re-rank == exact) and the heterogeneity
    // win. ORACLED since r8 via the model dump (cells + per-cell
    // rotations + shared codebook).
    QueryDef("q_local_opq_ann", localTrainedAnnSql) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val model = trainLocal(emb, nlist = 16, m = 8, k = 16, iters = 6)
      OracleDump.write(IvfAdcOps.centroidDf(s, model.ivf.centroids), d, "lopq_cents")
      OracleDump.write(PqOps.codebookDf(s, model.ivf.pq), d, "lopq_codebook")
      OracleDump.write(localRotationsDf(s, model.rotations), d, "lopq_rotations")
      searchLocal(
        encodeLocal(emb, model), emb,
        emb.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding")),
        model, topk = 3, nprobe = 4)
    })
}
