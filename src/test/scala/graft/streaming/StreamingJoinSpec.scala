package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.{FunnelOps, Tables}

/** Stream-stream interval join: batch parity on the real events table,
  * and the watermark contract (late rows dropped, state not unbounded)
  * across two AvailableNow drains of one checkpoint.
  */
class StreamingJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vSchema = new StructType()
    .add("view_id", LongType).add("v_user", LongType).add("v_ts", TimestampType)
  private val pSchema = new StructType()
    .add("purchase_id", LongType).add("p_user", LongType).add("p_ts", TimestampType)

  private def drain(vDir: String, pDir: String, out: String, ckpt: String, delay: String,
      joinType: String = "inner"): Unit = {
    val joined = StreamingJoin.viewPurchaseStream(
      spark.readStream.schema(vSchema).parquet(vDir),
      spark.readStream.schema(pSchema).parquet(pDir),
      delay, joinType)
    val q = joined.writeStream
      .format("parquet").option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def pairs(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

  test("stream-stream join == batch twin on the sf0.01 events table") {
    val root = graft.TestTmp.dir("graft-ssj")
    val e = Tables.events(spark, "/root/testdata/sf0.01")
    val v = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    v.coalesce(1).write.parquet(s"$root/v")
    p.coalesce(1).write.parquet(s"$root/p")
    // delay wider than the table's 30-day span: nothing is late, so the
    // stream must reproduce the batch join EXACTLY
    drain(s"$root/v", s"$root/p", s"$root/out", s"$root/ckpt", "31 days")
    val streamed = pairs(spark.read.schema(
      new StructType().add("view_id", LongType).add("purchase_id", LongType).add("delta_us", LongType))
      .parquet(s"$root/out"))
    val batch = pairs(FunnelOps.viewPurchasePairs(v, p))
    assert(streamed.nonEmpty, "join must produce pairs at sf0.01")
    assert(streamed == batch, "stream-stream result must equal the oracle-checked batch twin")
  }

  test("watermark contract: late rows dropped, on-time rows still join, across checkpointed drains") {
    val root = graft.TestTmp.dir("graft-ssj2")
    def vRows(rows: Seq[(Long, Long, String)]): DataFrame =
      rows.toDF("view_id", "v_user", "t")
        .select(col("view_id"), col("v_user"), to_timestamp(col("t")).as("v_ts"))
    def pRows(rows: Seq[(Long, Long, String)]): DataFrame =
      rows.toDF("purchase_id", "p_user", "t")
        .select(col("purchase_id"), col("p_user"), to_timestamp(col("t")).as("p_ts"))

    // drain 1: one matching pair, plus clock rows on BOTH sides — the
    // global watermark is the MIN across streams, so a side whose max
    // event time lags would hold the whole join's watermark back
    val v1 = vRows(Seq((1L, 100L, "2024-06-01 10:00:00"), (2L, 999L, "2024-06-01 20:00:00")))
    val p1 = pRows(Seq((11L, 100L, "2024-06-01 10:30:00"), (19L, 998L, "2024-06-01 20:00:00")))
    v1.coalesce(1).write.parquet(s"$root/v")
    p1.coalesce(1).write.parquet(s"$root/p")
    drain(s"$root/v", s"$root/p", s"$root/out", s"$root/ckpt", "1 hour")
    // watermark now 19:00 (min-side max 20:00 − 1 h delay)

    // drain 2: a pair entirely BEHIND the watermark (12:00/12:30) and an
    // on-time pair ahead of it (20:30/21:00)
    vRows(Seq((3L, 100L, "2024-06-01 12:00:00"), (4L, 200L, "2024-06-01 20:30:00")))
      .coalesce(1).write.mode("append").parquet(s"$root/v")
    pRows(Seq((12L, 100L, "2024-06-01 12:30:00"), (13L, 200L, "2024-06-01 21:00:00")))
      .coalesce(1).write.mode("append").parquet(s"$root/p")
    drain(s"$root/v", s"$root/p", s"$root/out", s"$root/ckpt", "1 hour")

    val streamed = pairs(spark.read.schema(
      new StructType().add("view_id", LongType).add("purchase_id", LongType).add("delta_us", LongType))
      .parquet(s"$root/out"))
    val batch = pairs(FunnelOps.viewPurchasePairs(
      spark.read.schema(vSchema).parquet(s"$root/v"),
      spark.read.schema(pSchema).parquet(s"$root/p")))
    assert(batch.map(x => (x._1, x._2)) == Seq((1L, 11L), (3L, 12L), (4L, 13L)),
      "batch over all files sees all three pairs")
    assert(streamed.map(x => (x._1, x._2)) == Seq((1L, 11L), (4L, 13L)),
      "stream drops exactly the pair behind the watermark and emits the on-time one")
  }

  test("left-outer: unmatched views emit null-padded once the watermark proves no match can come") {
    val root = graft.TestTmp.dir("graft-ssj3")
    def vRows(rows: Seq[(Long, Long, String)]) =
      rows.toDF("view_id", "v_user", "t")
        .select(col("view_id"), col("v_user"), to_timestamp(col("t")).as("v_ts"))
    def pRows(rows: Seq[(Long, Long, String)]) =
      rows.toDF("purchase_id", "p_user", "t")
        .select(col("purchase_id"), col("p_user"), to_timestamp(col("t")).as("p_ts"))

    // A matched view, an unmatched view, and clock rows on both sides
    vRows(Seq((1L, 100L, "2024-06-01 10:00:00"), (2L, 200L, "2024-06-01 10:00:00"),
      (90L, 900L, "2024-06-01 20:00:00")))
      .coalesce(1).write.parquet(s"$root/v")
    pRows(Seq((11L, 100L, "2024-06-01 10:30:00"), (91L, 901L, "2024-06-01 20:00:00")))
      .coalesce(1).write.parquet(s"$root/p")
    drain(s"$root/v", s"$root/p", s"$root/out", s"$root/ckpt", "1 hour", "left_outer")

    // advance the watermark to 22:00: view 90 (no-match horizon 21:00)
    // becomes provably unmatched; view 92 (horizon 24:00) stays pending
    vRows(Seq((92L, 902L, "2024-06-01 23:00:00")))
      .coalesce(1).write.mode("append").parquet(s"$root/v")
    pRows(Seq((93L, 903L, "2024-06-01 23:00:00")))
      .coalesce(1).write.mode("append").parquet(s"$root/p")
    drain(s"$root/v", s"$root/p", s"$root/out", s"$root/ckpt", "1 hour", "left_outer")

    val streamed = spark.read.schema(
      new StructType().add("view_id", LongType).add("purchase_id", LongType).add("delta_us", LongType))
      .parquet(s"$root/out")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq.sorted
    // view 2's null row needs only the drain-1 no-data batch (horizon
    // 11:00 < watermark 19:00); view 90 needs drain 2; view 92 must NOT
    // appear — its no-match horizon is past the final watermark
    assert(streamed == Seq((1L, 11L), (2L, -1L), (90L, -1L)),
      "null-padded rows emit exactly when the watermark passes each view's match horizon")
  }
}
