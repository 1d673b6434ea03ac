package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.ops.Tables
import graft.pipeline.Serve

/** Warm serve-path latency probe — the reference's one real "online"
  * surface (GET /data: readings.py:25-49 range scan + union + total
  * order + ISO-ms formatting) measured as a SERVING loop rather than a
  * batch query: the silver/gold frames are pinned in memory (the role
  * the reference's Postgres buffer pool plays), then `Serve.range` —
  * parameter parsing, both range-filtered branches, union, total sort,
  * response projection, collect — is invoked repeatedly over rotating
  * day windows and per-call wall latencies are reported as
  * p50/p90/p95/p99/max. The per-call floor on a local[32] session is
  * Spark job-scheduling overhead (~tens of ms), which is the honest
  * single-node serving number for this engine; a deployment fronting
  * this with sub-ms needs would keep the serve tier on the persisted
  * TxTable gold outputs behind a real store, exactly as the reference
  * fronts dbt outputs with Postgres.
  *
  * Run: `sbt "runMain graft.ServeLatency [sfDir] [calls]"` → one JSON
  * line; recorded in BASELINE.md.
  */
object ServeLatency {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val calls = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the serving store: silver readings + gold daily power, pinned
    val e = Tables.events(spark, sfDir).filter(col("event_type").isin("view", "click"))
    val silver = e.select(
      date_format(col("ts"), "yyyy-MM-dd").as("reading_date"),
      col("ts").as("reading_time"),
      col("event_type").as("metric_name"),
      col("value").as("metric_value")).persist()
    val gold = e
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        avg(when(col("event_type") === "view", col("value"))).as("avg_v"),
        avg(when(col("event_type") === "click", col("value"))).as("avg_c"))
      .filter(col("avg_v").isNotNull && col("avg_c").isNotNull)
      .select(
        date_format(col("d"), "yyyy-MM-dd").as("reading_date"),
        col("d").cast(TimestampType).as("reading_time"),
        lit("Power").as("metric_name"),
        round(col("avg_v") * col("avg_c"), 6).as("metric_value")).persist()
    println(s"[serve] store pinned: silver=${silver.count()} gold=${gold.count()} rows")

    def call(i: Int): (Double, Long) = {
      val fromDom = 1 + (i % 20)
      val days = 1 + (i % 7)
      val f = f"2024-01-$fromDom%02d"
      val t = f"2024-01-${fromDom + days}%02d"
      val t0 = System.nanoTime()
      val rows = Serve.range(silver, gold, Some(f), Some(t))
        .fold(msg => sys.error(s"serve rejected ($f,$t): $msg"), _.collect())
      ((System.nanoTime() - t0) / 1e6, rows.length.toLong)
    }
    (1 to 20).foreach(call) // warm the plans/codegen outside the window
    val timed = (1 to calls).map(call)
    def report(tier: String, ts: Seq[(Double, Long)]): Unit = {
      val lat = ts.map(_._1).sorted
      def pct(p: Double) = lat((p * (lat.size - 1)).round.toInt)
      println(
        f"""{"metric":"serve_latency","tier":"$tier","sf":"$sfDir","calls":$calls,"rows_per_call_avg":${ts.map(_._2).sum / calls},"p50_ms":${pct(0.50)}%.1f,"p90_ms":${pct(0.90)}%.1f,"p95_ms":${pct(0.95)}%.1f,"p99_ms":${pct(0.99)}%.1f,"max_ms":${lat.last}%.1f}""")
    }
    report("spark", timed)

    // the pinned-snapshot tier over the same store: one bounded collect
    // per version, then each range call is binary search + slice on the
    // driver — no Spark job in the serving loop
    val cache = graft.pipeline.ServeCache.fromFrames(silver, gold, maxRows = 50000000L)
    def cachedCall(i: Int): (Double, Long) = {
      val fromDom = 1 + (i % 20)
      val days = 1 + (i % 7)
      val f = f"2024-01-$fromDom%02d"
      val t = f"2024-01-${fromDom + days}%02d"
      val t0 = System.nanoTime()
      val rows = cache.range(Some(f), Some(t))
        .fold(msg => sys.error(s"serve rejected ($f,$t): $msg"), identity)
      ((System.nanoTime() - t0) / 1e6, rows.length.toLong)
    }
    (1 to 20).foreach(cachedCall)
    report("cached", (1 to calls).map(cachedCall))

    // CONCURRENT cached tier (r12 verdict item 6): N reader threads
    // hammering range() while (optionally) a writer commits new days
    // and swaps snapshots via refreshIfStale — the serving shape a real
    // deployment runs. The snapshot swap is one volatile write, so
    // reader latency must not degrade beyond scheduler noise and no
    // call may error mid-swap.
    def concurrentReport(tier: String, threads: Int, cacheCall: Int => (Double, Long),
        minWallSec: Double = 0.0): Unit = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val all = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val t0 = System.nanoTime()
      // duration mode (minWallSec > 0): loop until the wall passes —
      // the churn sections must SPAN several ~1.5 s commit+swap cycles,
      // which a fixed call count at ~40k calls/s never does
      val deadline = t0 + (minWallSec * 1e9).toLong
      val futures = (0 until threads).map { th =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0
            while (i < calls || System.nanoTime() < deadline) {
              all.add(cacheCall(th * calls + i)._1)
              i += 1
            }
          }
        })
      }
      futures.foreach(_.get())
      val wall = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      import scala.jdk.CollectionConverters._
      val lat = all.asScala.toSeq.sorted
      def pct(p: Double) = lat((p * (lat.size - 1)).round.toInt)
      println(
        f"""{"metric":"serve_latency","tier":"$tier","threads":$threads,"calls":${lat.size},"p50_ms":${pct(0.50)}%.3f,"p90_ms":${pct(0.90)}%.3f,"p99_ms":${pct(0.99)}%.3f,"max_ms":${lat.last}%.3f,"throughput_calls_per_s":${lat.size / wall}%.0f}""")
    }
    for (threads <- Seq(8, 16)) concurrentReport("cached-concurrent", threads, cachedCall)

    // with refresh churn: the same store committed as TxTables, a
    // writer thread appending one synthetic day + refreshIfStale in a
    // tight loop for the whole read window
    val base = java.nio.file.Files.createTempDirectory("serve-churn").toFile.getAbsolutePath
    val (sRoot, gRoot) = (s"$base/silver", s"$base/gold")
    graft.pipeline.TxTable.commit(spark, sRoot, silver, "reading_date")
    graft.pipeline.TxTable.commit(spark, gRoot, gold, "reading_date")
    val churnCache = graft.pipeline.ServeCache.fromTxTables(
      spark, sRoot, gRoot, maxRows = 50000000L)
    def churnCall(i: Int): (Double, Long) = {
      val fromDom = 1 + (i % 20)
      val days = 1 + (i % 7)
      val f = f"2024-01-$fromDom%02d"
      val t = f"2024-01-${fromDom + days}%02d"
      val t0 = System.nanoTime()
      val rows = churnCache.range(Some(f), Some(t))
        .fold(msg => sys.error(s"serve rejected ($f,$t): $msg"), identity)
      ((System.nanoTime() - t0) / 1e6, rows.length.toLong)
    }
    @volatile var writing = true
    var swaps = 0
    val writer = new Thread(() => {
      var day = 1
      while (writing && day <= 60) {
        val d = f"2025-03-$day%02d"
        graft.pipeline.TxTable.appendCommit(spark, sRoot,
          Seq((d, s"$d 00:00:01", "click", day.toDouble))
            .toDF("reading_date", "ts", "metric_name", "metric_value")
            .select(col("reading_date"), to_timestamp(col("ts")).as("reading_time"),
              col("metric_name"), col("metric_value")),
          "reading_date")
        if (churnCache.refreshIfStale()) swaps += 1
        day += 1
      }
    })
    writer.start()
    (1 to 20).foreach(churnCall)
    for (threads <- Seq(8, 16))
      concurrentReport("cached-churn", threads, churnCall, minWallSec = 8.0)
    writing = false
    writer.join()
    println(s"""{"metric":"serve_churn_swaps","swaps":$swaps}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    spark.stop()
  }
}
