package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.StreamingHeavyHitters.Emit

/** Streaming SpaceSaving: exact-regime parity with a plain count across
  * micro-batches (state survives the checkpoint), and the Metwally
  * error bound in the genuinely approximate regime.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def drain(root: String, capacity: Int, k: Int): Unit = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = Seq("").toDF("token").schema
      val stream = spark.readStream.schema(schema).parquet(s"$root/in")
      val q = StreamingHeavyHitters
        .topkStream(stream, nShards = 8, capacity = capacity, k = k)
        .writeStream
        .outputMode("append").format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .start()
      q.processAllAvailable()
      q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  private def topk(root: String, k: Int): Seq[(String, Long, Long)] =
    StreamingHeavyHitters.latestTopK(spark.read.parquet(s"$root/out"), k)
      .as[(String, Long, Long)].collect().toSeq

  test("exact regime: streamed top-k equals the plain count across micro-batches") {
    val root = graft.TestTmp.dir("graft-shh")
    val b1 = Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(5)("gamma")
    val b2 = Seq.fill(25)("beta") ++ Seq.fill(10)("delta") ++ Seq.fill(2)("alpha")

    b1.toDF("token").write.mode("append").parquet(s"$root/in")
    drain(root, capacity = 64, k = 5)
    assert(topk(root, 3) == Seq(("alpha", 30L, 0L), ("beta", 20L, 0L), ("gamma", 5L, 0L)))

    // second drain resumes the checkpoint: counts accumulate across batches
    b2.toDF("token").write.mode("append").parquet(s"$root/in")
    drain(root, capacity = 64, k = 5)
    assert(topk(root, 4) == Seq(
      ("beta", 45L, 0L), ("alpha", 32L, 0L), ("delta", 10L, 0L), ("gamma", 5L, 0L)),
      s"accumulated counts wrong: ${topk(root, 4)}")
  }

  test("approximate regime: est >= true >= est - err for every reported token") {
    val root = graft.TestTmp.dir("graft-shh2")
    // heavy-tailed stream: a few heavy tokens + a long unique tail, with
    // capacity (4) far below the vocabulary so eviction genuinely runs
    val data = Seq.fill(200)("heavy1") ++ Seq.fill(120)("heavy2") ++
      (0 until 300).map(i => s"tail$i")
    data.toDF("token").write.mode("append").parquet(s"$root/in")
    drain(root, capacity = 4, k = 4)

    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = topk(root, 32) // all emitted counters, not just the global top
    assert(got.nonEmpty)
    for ((tok, est, err) <- got) {
      val t = truth(tok)
      assert(est >= t && t >= est - err, s"$tok: est=$est err=$err true=$t")
    }
    // the genuinely heavy tokens must be reported despite the tail
    val reported = got.map(_._1).toSet
    assert(reported.contains("heavy1") && reported.contains("heavy2"), s"$reported")
  }
}
