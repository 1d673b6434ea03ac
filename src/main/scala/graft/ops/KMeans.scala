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

  final case class Model(centroids: Array[Array[Double]], inertia: Double) {
    def k: Int = centroids.length
  }

  private def embDouble = transform(col("embedding"), _.cast(DoubleType)).as("emb")

  private def centroidDf(spark: SparkSession, centroids: Array[Array[Double]]): DataFrame = {
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
