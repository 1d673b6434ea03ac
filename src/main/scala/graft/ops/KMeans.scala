package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HashFunctions.dot_product

/** Distributed Lloyd's k-means over an embedding column — the real
  * "training" stage for the IVF index (IvfOps uses a deterministic
  * first-k stand-in so its oracle can reproduce it; this module is the
  * production path).
  *
  * Each iteration is two Spark jobs: (1) assignment = broadcast-centroid
  * argmin-L2 over the corpus (map-only — centroids are k×dim doubles,
  * always broadcastable); (2) new centroids = per-(cluster, dim) mean via
  * posexplode + one shuffle on (cluster, dim) — k×dim rows collected to
  * the driver. No iteration ever shuffles the vectors themselves.
  *
  * Determinism: init = first k vectors by vec_id; argmin ties break on
  * the lower centroid id; an emptied cluster keeps its previous centroid.
  */
object KMeans {

  /** Default training-sample cap (FAISS-style: IVF needs ~100x nlist
    * training points, not the corpus).
    */
  val DefaultMaxSample = 20000

  final case class Model(centroids: Array[Array[Double]], inertia: Double) {
    def k: Int = centroids.length
  }

  private def embDouble = transform(col("embedding"), _.cast(DoubleType)).as("emb")

  private[graft] def centroidDf(spark: SparkSession, centroids: Array[Array[Double]]): DataFrame = {
    val rows = centroids.zipWithIndex.map { case (c, i) => Row(i, c.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("cid", IntegerType, nullable = false),
        StructField("cemb", ArrayType(DoubleType, containsNull = false), nullable = false))))
  }

  /** Squared L2 distance via the native dot kernel:
    * |a-b|² = a·a − 2a·b + b·b.
    */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    dot_product(a, a) - lit(2.0) * dot_product(a, b) + dot_product(b, b)

  /** Assignment of every vector to its nearest centroid. */
  def assignClusters(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    // broadcast argmin KERNEL, not crossJoin + window: the join form
    // materializes rows × k candidate rows (each carrying the full
    // embedding) through a per-vector SORT — at 10M vectors × 1024
    // centroids that is ~10B rows / TBs of sort spill, the measured
    // ENOSPC killer of the 10M ANN soak. The kernel is one map-shaped
    // pass: argmin over the broadcast codebook per row, zero shuffle,
    // zero intermediate blowup — the shape a 100 TB assignment must
    // have. Float-exact twin of the join form (spec-pinned): d2 =
    // a·a − 2(a·b) + b·b with every dot accumulated in ascending
    // index order from 0.0 (dot_product's order, = DuckDB's
    // list_dot_product), ties broken toward the LOWest cid by the
    // strict < scan — exactly the old window's (d2 asc, cid asc).
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select(col("vec_id"), embDouble).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cents = bc.value
        val k = cents.length
        // b·b per centroid, once per partition
        val cc = new Array[Double](k)
        var i = 0
        while (i < k) {
          val c = cents(i); var s = 0.0; var j = 0
          while (j < c.length) { s += c(j) * c(j); j += 1 }
          cc(i) = s; i += 1
        }
        it.map { case (id, e) =>
          val n = e.length
          val a = new Array[Double](n)
          var j = 0
          while (j < n) { a(j) = e(j); j += 1 }
          var aa = 0.0; j = 0
          while (j < n) { aa += a(j) * a(j); j += 1 }
          var best = 0; var bestD = Double.PositiveInfinity
          var ci = 0
          while (ci < k) {
            val c = cents(ci)
            var ab = 0.0; var j2 = 0
            while (j2 < n) { ab += a(j2) * c(j2); j2 += 1 }
            val d2 = aa - 2.0 * ab + cc(ci)
            if (d2 < bestD) { bestD = d2; best = ci }
            ci += 1
          }
          (id, best, e, bestD)
        }
      }
      .toDF("vec_id", "cluster", "emb", "d2")
  }

  /** The old crossJoin + window formulation of [[assignClusters]] —
    * kept ONLY as the spec's equivalence reference (KMeansSpec pins
    * kernel ≡ join float-for-float); never call it on a large corpus. */
  private[graft] def assignClustersJoin(
      emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)
    emb.select(col("vec_id"), embDouble)
      .crossJoin(broadcast(centroidDf(spark, centroids)))
      .withColumn("d2", dist2(col("emb"), col("cemb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").as("cluster"), col("emb"), col("d2"))
  }

  /** Deterministic farthest-first (Gonzalez) initialization: start at the
    * lowest vec_id, then repeatedly add the point farthest from the
    * chosen set (ties → lowest vec_id). Avoids the first-k trap where all
    * seeds land in one cluster; k cheap broadcast passes.
    */
  def farthestFirstInit(emb: DataFrame, k: Int): Array[Array[Double]] = {
    val spark = emb.sparkSession
    val base = emb.select(col("vec_id"), embDouble)
    val first = base.orderBy("vec_id").limit(1).collect()(0).getSeq[Double](1).toArray
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    while (chosen.size < k) {
      val next = base
        .crossJoin(broadcast(centroidDf(spark, chosen.toArray)))
        .withColumn("d2", dist2(col("emb"), col("cemb")))
        .groupBy(col("vec_id")).agg(min(col("d2")).as("mind2"), first_value(col("emb")).as("emb"))
        .orderBy(col("mind2").desc, col("vec_id").asc)
        .limit(1)
        .collect()(0)
      chosen += next.getSeq[Double](next.fieldIndex("emb")).toArray
    }
    chosen.toArray
  }

  /** Sample-trained k-means — the production path at scale: collect a
    * deterministic hash-ordered sample (the FAISS convention: IVF
    * training needs ~100×nlist vectors, not the corpus), run
    * farthest-first + Lloyd locally on the driver, broadcast the
    * centroids for the distributed assignment. One Spark job (a
    * TakeOrdered) instead of k init passes + 2 jobs per Lloyd iteration,
    * and — unlike the distributed fit — bit-deterministic regardless of
    * partitioning, because the local arithmetic has a fixed order.
    */
  /** Deterministic hash-ordered training sample (shared by IVF and PQ
    * training — ONE sampling convention, so their determinism can never
    * silently diverge): order by xxhash64(vec_id) with the id as tie
    * break, take maxSample (a TakeOrdered — one Spark job).
    */
  def samplePoints(emb: DataFrame, maxSample: Int): Array[Array[Double]] =
    emb.select(col("vec_id"), embDouble)
      .orderBy(pmod(xxhash64(col("vec_id")), lit(1000003L)), col("vec_id"))
      .limit(maxSample)
      .collect().map(_.getSeq[Double](1).toArray)

  def fitSample(
      emb: DataFrame,
      k: Int,
      iters: Int = 5,
      maxSample: Int = DefaultMaxSample,
      spherical: Boolean = false): Model =
    fitArrays(samplePoints(emb, maxSample), k, iters, spherical)

  /** Local Lloyd with the same deterministic conventions as the
    * distributed fit: farthest-first init from the first sample point
    * (ties → first in hash order), argmin ties → lowest centroid id,
    * emptied cluster keeps its previous centroid. Inertia is over the
    * training sample.
    *
    * `spherical = true` renormalizes each centroid to unit length after
    * every mean update (the spherical k-means step): with unit inputs
    * AND unit centroids, argmin L2 is exactly argmax cosine — without
    * the renormalization, centroid norms vary with cluster tightness
    * and the ||c||² term biases assignment toward tight clusters.
    */
  private[ops] def fitArrays(
      pts: Array[Array[Double]],
      k: Int,
      iters: Int,
      spherical: Boolean = false): Model = {
    require(pts.nonEmpty, "k-means training sample is empty")
    val kk = math.min(k, pts.length)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(pts(0).clone())
    val minD = Array.fill(pts.length)(Double.MaxValue)
    while (chosen.size < kk) {
      var best = 0; var bestD = -1.0; var i = 0
      while (i < pts.length) {
        val d = math.min(minD(i), d2(pts(i), chosen.last)); minD(i) = d
        if (d > bestD) { bestD = d; best = i }
        i += 1
      }
      chosen += pts(best).clone()
    }
    var centroids = chosen.toArray
    for (_ <- 0 until iters) {
      val dim = pts(0).length
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      pts.foreach { p =>
        var bi = 0; var bd = Double.MaxValue; var c = 0
        while (c < kk) {
          val d = d2(p, centroids(c)); if (d < bd) { bd = d; bi = c }; c += 1
        }
        counts(bi) += 1
        var j = 0; while (j < dim) { sums(bi)(j) += p(j); j += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old
        else {
          val m = sums(c).map(_ / counts(c))
          if (spherical) {
            val n = math.sqrt(m.map(x => x * x).sum)
            if (n > 0) m.map(_ / n) else old // degenerate mean: keep previous direction
          } else m
        }
      }
    }
    val inertia = pts.iterator.map(p => centroids.iterator.map(c => d2(p, c)).min).sum
    Model(centroids, inertia)
  }

  def fit(emb: DataFrame, k: Int, iters: Int = 5): Model = {
    val spark = emb.sparkSession
    var centroids: Array[Array[Double]] = farthestFirstInit(emb, k)
    (0 until iters).foreach { _ =>
      // cache: the means collect is the only consumer per iteration, but
      // the assignment cross-join is the dominant cost — keep it warm
      // for the two jobs (explode-agg + unpersist bookkeeping)
      val assigned = assignClusters(emb, centroids).persist()
      // per-(cluster, dim) means: k*dim tiny rows after one shuffle
      val means = assigned
        .select(col("cluster"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(avg(col("v")).as("m"))
        .collect()
      assigned.unpersist()
      val next = centroids.map(_.clone())
      means.foreach { r =>
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("dim")) = r.getAs[Double]("m")
      }
      centroids = next
    }
    // inertia of the RETURNED centroids (measuring before the update
    // would report the previous model's objective)
    val inertia = assignClusters(emb, centroids).agg(sum(col("d2"))).head().getDouble(0)
    Model(centroids, inertia)
  }
}
