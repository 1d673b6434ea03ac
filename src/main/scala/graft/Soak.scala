package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.pipeline.CorpusIngest

/** 10× soak of the dedup/CC/ingest path — measured evidence that the
  * bucketed designs hold past the driver's sf0.1 island. Generates a
  * one-off synthetic corpus 10× the sf0.1 documents table (50k docs,
  * seeded, with planted near-dup families whose chain structure gives
  * the CC phases real multi-hop components), then runs the composed
  * ingest, the LSH pair pipeline, and BOTH connected-components
  * algorithms over it, printing per-phase wall time, shuffle bytes
  * (from stage metrics), and round counts. The numbers land in
  * SCALE.md §10; driver testdata is never touched.
  *
  * Run: `sbt "runMain graft.Soak"` (optional arg: doc count).
  */
object Soak {

  private final class PhaseMeter(spark: SparkSession) {
    private val shuffleRead = new AtomicLong
    private val shuffleWrite = new AtomicLong
    private val taskMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffleRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        ()
      }
    })
    def measure[T](name: String)(body: => T): T = {
      // quiesce the listener bus so a prior phase's stages don't bleed
      // in. BEST-EFFORT attribution: the bus is async and these fixed
      // waits are a heuristic — under heavy ambient load a stage
      // completion can still land in the wrong phase's counters (wall
      // time is exact; the shuffle/taskTime split is approximate, and
      // the printed tag says so). Exact attribution would need
      // per-phase stage-id bookkeeping; the soak numbers are coarse
      // evidence, not a benchmark, so the honest label is enough.
      Thread.sleep(300)
      shuffleRead.set(0); shuffleWrite.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val r = body
      Thread.sleep(300)
      println(f"[soak] $name%-28s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"shuffleRead=${shuffleRead.get / 1048576.0}%8.1f MiB  " +
        f"shuffleWrite=${shuffleWrite.get / 1048576.0}%8.1f MiB  " +
        f"taskTime=${taskMs.get / 1000.0}%7.1f s  (shuffle/task best-effort)")
      r
    }
  }

  /** Seeded corpus: ~60% singleton docs, rest in families of 2–8 whose
    * members perturb a shared base text by one word per CHAIN HOP
    * (member i mutates member i−1's text), so LSH links neighbors but
    * not necessarily family ends — multi-hop CC components by
    * construction, the regime the star algorithm exists for.
    */
  private[graft] def genDocsPublic(spark: SparkSession, n: Long): DataFrame = genDocs(spark, n)

  private def genDocs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val vocabBc = spark.sparkContext.broadcast(
      Array.tabulate(2000)(i => s"w${i}x${(i * 2654435761L & 0xffff).toHexString}"))
    // every 6th word is a stopword so the C4-style quality gate's
    // stopword-ratio floor (>= 0.03) passes — without it the whole
    // corpus is rejectedQuality and the ingest path is vacuous
    val stops = Array("the", "and", "of", "to", "in", "is")
    spark.range(0, n, 1, 64).as[Long].mapPartitions { it =>
      val vocab = vocabBc.value
      it.map { id =>
        // family structure from the id: blocks of 10; in each block,
        // ids 0-5 are singletons, 6-9 form a 4-chain family
        val block = id / 10
        val off = (id % 10).toInt
        val (seedId, hop) = if (off < 6) (id, 0) else (block * 10 + 6, off - 6)
        val rnd = new scala.util.Random(seedId * 1000003L + 17)
        val words = Array.tabulate(40)(i =>
          if (i % 6 == 5) stops(rnd.nextInt(stops.length))
          else vocab(rnd.nextInt(vocab.length)))
        // each hop mutates ONE more word of the shared base: adjacent
        // hops overlap in 39/40 words (J ≈ 0.95), ends in 37/40
        var h = 0
        while (h < hop) { words(h * 3) = s"mut${id}h$h"; h += 1 }
        (id, words.mkString(" "), "en", s"src${(id % 7)}")
      }
    }.toDF("doc_id", "text", "lang", "source")
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000L
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new PhaseMeter(spark)
    val root = s"/tmp/graft_soak_$n"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

    val docs = meter.measure("generate+write corpus") {
      genDocs(spark, n).write.mode("overwrite").parquet(s"$root/docs")
      spark.read.parquet(s"$root/docs")
    }
    val textMb = docs.agg(sum(length(col("text")))).head().getLong(0) / 1048576.0
    println(f"[soak] corpus: ${docs.count()} docs, $textMb%.1f MiB text")

    // composed ingest (quality -> dedup gate -> blind-append TxTable),
    // two half-batches so the second exercises the persisted index
    val (h1, h2) = (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    val s1 = meter.measure("CorpusIngest batch 1/2") {
      CorpusIngest.ingestBatch(spark, s"$root/corpus", s"$root/index", h1)
    }
    val s2 = meter.measure("CorpusIngest batch 2/2") {
      CorpusIngest.ingestBatch(spark, s"$root/corpus", s"$root/index", h2)
    }
    println(s"[soak] ingest 1: $s1 reconciles=${s1.reconciles}")
    println(s"[soak] ingest 2: $s2 reconciles=${s2.reconciles}")

    val pairs = meter.measure("LSH near-dup pairs") {
      val p = DedupOps.minhashNearDups(docs, threshold = 0.3).persist()
      println(s"[soak] pairs: ${p.count()}")
      p
    }
    meter.measure("CC min-label (iterative)") {
      val c = DedupOps.connectedComponents(pairs, maxIters = 30, smallGraphMaxEdges = 0L)
      println(s"[soak] min-label: ${c.count()} labeled nodes, " +
        s"rounds=${DedupOps.lastIterationMillis.length}, " +
        s"perRoundMs=${DedupOps.lastIterationMillis.mkString(",")}")
    }
    meter.measure("CC star (log-rounds)") {
      val c = DedupOps.connectedComponentsStar(pairs)
      println(s"[soak] star: ${c.count()} labeled nodes, rounds=${DedupOps.lastStarRounds}")
    }
    meter.measure("dedupGroups end-to-end") {
      val g = DedupOps.dedupGroups(docs, threshold = 0.3)
      println(s"[soak] groups: ${g.count()} rows, " +
        s"${g.filter(!col("is_canonical")).count()} non-canonical")
    }
    spark.stop()
  }
}
