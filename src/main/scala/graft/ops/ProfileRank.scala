package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the rank-loop family (q_pagerank / q_hits /
  * q_ppr_seed): drives the REAL GraphOps entry points with a job
  * listener splitting each query's wall into jobs vs gaps — the loop
  * runs ~10–20 tiny jobs on a low-partition AQE-off session, so the
  * split tells whether the residual seconds are executor compute
  * (job wall) or driver latency between jobs (plan analysis of the
  * unrolled round tree, broadcast builds, scheduling). The ProfileIncr
  * convention: phases in dependency order, two reps of each query so
  * the first-rep JIT/edge-cache cost is visible separately.
  */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.SparkEntry.entry(spark).count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(si =>
          si.name.take(60) + " stages=" + js.stageInfos.size).getOrElse("?")
        jobs.put(js.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, site) =>
          done.add((System.nanoTime() - t0, site)); ()
        }
      }
    })
    def time[T](name: String)(f: => T): T = {
      Thread.sleep(200)
      done.clear()
      val t0 = System.nanoTime()
      val v = f
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val ds = done.asScala.toSeq
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"jobs=${ds.size}%3d jobWall=${ds.map(_._1).sum / 1e9}%6.2f s")
      ds.sortBy(-_._1).take(10).foreach { case (ns, site) =>
        println(f"    ${ns / 1e9}%6.2f s  $site")
      }
      v
    }

    time("edges (cold cache)")(GraphOps.coOrderEdges(spark, d).count())
    // interleaved A/B over the small-graph loop-shape knobs: host
    // ambient drifts by tens of percent over minutes here, so
    // back-to-back variant pairs (not blocked runs) are the only
    // honest comparison; read medians per variant across reps.
    val variants = Seq(
      ("base      (bcast mass, 32-part e)", false, false),
      ("coalesceE (bcast mass,  few-part e)", true, false),
      ("merge     (SMJ mass,   32-part e)", false, true),
      ("both      (SMJ mass,    few-part e)", true, true))
    val queries = sys.env.getOrElse(
      "SPARK_GRAFT_PROF_QUERIES", "q_pagerank,q_hits,q_ppr_seed").split(",").toSeq
    for (rep <- 1 to sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt) {
      for ((label, ce, mm) <- variants) {
        GraphOps.rankLoopCoalesceE = ce
        GraphOps.rankLoopMergeMassJoin = mm
        for (q <- queries) {
          time(f"$q%-12s rep$rep $label") {
            graft.SparkEntry.queries(q)(spark, d)
              .write.format("noop").mode("overwrite").save()
          }
        }
      }
    }
    GraphOps.rankLoopCoalesceE = true
    GraphOps.rankLoopMergeMassJoin = true
    spark.stop()
  }
}
