package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the incremental-export oracle key: drives the
  * REAL [[graft.pipeline.PretrainExport.append]] path (not a replica)
  * phase by phase, with a job listener counting Spark jobs and summing
  * job wall per phase — the fixed per-job driver latency on the
  * low-partition session is the suspected dominant cost, so job COUNT
  * is the number to watch, not just wall.
  */
object ProfileIncr {
  def main(args: Array[String]): Unit = {
    val spark0 = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    graft.SparkEntry.entry(spark0).count()

    // per-phase job accounting (job id -> (start ns, callsite))
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    spark0.sparkContext.addSparkListener(new SparkListener {
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
      Thread.sleep(200) // let listener events drain between phases
      done.clear()
      val t0 = System.nanoTime()
      val v = f
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val ds = done.asScala.toSeq
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"jobs=${ds.size}%3d jobWall=${ds.map(_._1).sum / 1e9}%6.2f s")
      ds.sortBy(-_._1).take(8).foreach { case (ns, site) =>
        println(f"    ${ns / 1e9}%6.2f s  $site")
      }
      v
    }

    import graft.pipeline.PretrainExport
    val model = time("pinned model")(PretrainExportOps.pinnedTokenizer(spark0, d))
    val incr = spark0.newSession()
    spark0.conf.getAll.foreach { case (k, v) =>
      try incr.conf.set(k, v) catch { case scala.util.control.NonFatal(_) => () }
    }
    incr.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_PROF_PARTS", "8"))
    incr.conf.set("spark.sql.codegen.wholeStage",
      sys.env.getOrElse("SPARK_GRAFT_PROF_CODEGEN", "false"))
    incr.conf.set("spark.sql.adaptive.enabled",
      sys.env.getOrElse("SPARK_GRAFT_PROF_AQE", "false"))
    val docs = Tables.documents(incr, d)
    val root = "/tmp/graft_incr_export/profile4"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    time("initPinned")(PretrainExport.initPinned(incr, root, model))
    val r = time("split agg")(docs.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0))
    val split = (r.getLong(0) + r.getLong(1)) / 2
    if (sys.env.get("SPARK_GRAFT_PROF_PLAIN").contains("1")) {
      time("append b1")(PretrainExport.append(incr, root, docs.filter(col("doc_id") <= split)))
      time("append b2")(PretrainExport.append(incr, root, docs.filter(col("doc_id") > split)))
    } else {
      val prep = time("prepare")(PretrainExport.prepare(incr, root, docs))
      time("append b1")(PretrainExport.appendPrepared(incr, root, prep, r.getLong(0), split))
      time("append b2")(PretrainExport.appendPrepared(incr, root, prep, split + 1, r.getLong(1)))
    }
    val accepted = docs.join(
      PretrainExport.shardTable(incr, root).select("doc_id"), Seq("doc_id"), "left_semi")
    time("dump tokenize")(graft.ops.UnigramLmOps.tokenize(accepted, model, maxLen = 4)
      .write.format("noop").mode("overwrite").save())
    time("manifest")(PretrainExport.manifest(incr, root)
      .write.format("noop").mode("overwrite").save())
    spark0.stop()
  }
}
