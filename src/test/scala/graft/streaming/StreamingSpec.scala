package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming pipeline tests: AvailableNow drain + foreachBatch merge
  * (tier 1, faithful) and watermarked tumbling-window aggregation
  * (tier 2, idiomatic).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AvailableNow drain: files -> silver parquet; second drain of same checkpoint is a no-op; new file merges") {
    val root = graft.TestTmp.dir("graft-stream")
    val bronzeDir = s"$root/bronze"
    val silverPath = s"$root/silver"
    val ckpt = s"$root/ckpt"
    new java.io.File(bronzeDir).mkdirs()

    Files.writeString(
      java.nio.file.Paths.get(s"$bronzeDir/batch1.txt"),
      "1649941817 Voltage 1.34\n1649941818 Voltage 1.35\n1649941817 Current 12.0\n1649941818 Current 14.0\nnot a line\n")

    StreamingPipeline.runBronzeToSilverAvailableNow(spark, bronzeDir, silverPath, ckpt)
    val s1 = spark.read.parquet(silverPath)
    assert(s1.count() == 4, "4 valid lines parsed, invalid dropped")

    // drain again with nothing new: checkpoint file-log skips the file
    StreamingPipeline.runBronzeToSilverAvailableNow(spark, bronzeDir, silverPath, ckpt)
    assert(spark.read.parquet(silverPath).count() == 4)

    // new file: every line becomes a NEW reading with a fresh raw_id —
    // including an exact repeat of an earlier line, exactly as a
    // re-POSTed line gets a new bronze id in the reference. Exactly-once
    // comes from the checkpointed file log (proved by the no-op re-drain
    // above), and replay-stable per-batch ids make a FAILED batch's
    // re-execution merge idempotently on raw_id.
    Files.writeString(
      java.nio.file.Paths.get(s"$bronzeDir/batch2.txt"),
      "1649941819 Voltage 1.36\n1649941817 Voltage 9.99\n1649941817 Voltage 1.34\n")
    StreamingPipeline.runBronzeToSilverAvailableNow(spark, bronzeDir, silverPath, ckpt)
    val s3 = spark.read.parquet(silverPath)
    assert(s3.count() == 7, "three new readings appended (reference raw_id semantics)")
    val at17 = s3.filter(col("metric_name") === "Voltage" &&
      col("reading_time") === to_timestamp(lit("2022-04-14 13:10:17")))
      .collect().map(_.getAs[Double]("metric_value")).sorted
    assert(at17.toSeq == Seq(1.34, 1.34, 9.99),
      "re-sent identical reading is a distinct row, like the batch path")

    // gold after drain (TxTable manifest log — read via TxTable.read)
    val goldPath = s"$root/gold"
    StreamingPipeline.goldAfterDrain(spark, silverPath, goldPath)
    val g = graft.pipeline.TxTable.read(spark, goldPath).collect()
    assert(g.length == 1)
    assert(g(0).getAs[String]("metric_name") == "Power")
  }

  test("tier-2 watermarked daily window produces the same Power value as batch gold") {
    val root = graft.TestTmp.dir("graft-stream2")
    val parsed = Seq(
      ("2022-04-14 13:10:17", "Voltage", 1.34),
      ("2022-04-14 13:10:18", "Voltage", 1.35),
      ("2022-04-14 13:10:17", "Current", 12.0),
      ("2022-04-14 13:10:18", "Current", 14.0))
      .toDF("t", "metric_name", "metric_value")
      .withColumn("reading_time", to_timestamp(col("t")))
      .select("reading_time", "metric_name", "metric_value")
    parsed.write.mode("overwrite").parquet(s"$root/in")

    val stream = spark.readStream.schema(parsed.schema).parquet(s"$root/in")
    val agg = StreamingPipeline.dailyPowerStreaming(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("gold_stream")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("gold_stream").collect()
    assert(rows.length == 1)
    assert(math.abs(rows(0).getAs[Double]("metric_value") - 17.485) < 1e-9)
    assert(rows(0).getAs[java.sql.Date]("reading_date").toString == "2022-04-14")
  }

  test("tier-2 bounded lateness: beyond-watermark rows are dropped (documented divergence from tier-1)") {
    val root = graft.TestTmp.dir("graft-late")
    import graft.streaming.StreamingPipeline
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("reading_time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("metric_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("metric_value", org.apache.spark.sql.types.DoubleType)))
    def batch(rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("t", "metric_name", "metric_value")
        .withColumn("reading_time", to_timestamp(col("t")))
        .select("reading_time", "metric_name", "metric_value")
        .write.mode("append").parquet(s"$root/in")
    // batch 1: day 1 data, then far-future data advancing the watermark
    // past day 1 + 1-day lateness
    batch(Seq(
      ("2022-04-14 10:00:00", "Voltage", 1.0),
      ("2022-04-14 10:00:00", "Current", 10.0)))
    val stream = spark.readStream.schema(schema).parquet(s"$root/in")
    val agg = StreamingPipeline.dailyPowerStreaming(stream, lateness = "1 day")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("late_out").option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    batch(Seq(("2022-04-20 00:00:00", "Voltage", 5.0), ("2022-04-20 00:00:00", "Current", 5.0)))
    q.processAllAvailable()
    // batch 3: LATE reading for day 1 — watermark is now ~Apr 19, so this
    // must be discarded, NOT recomputed (tier-1 would recompute the day)
    batch(Seq(("2022-04-14 11:00:00", "Voltage", 99.0)))
    q.processAllAvailable()
    q.stop()
    val day1 = spark.table("late_out")
      .filter(col("reading_date") === "2022-04-14").collect()
    // append mode emits day 1 once its window passes the watermark;
    // the late 99.0 must NOT have contributed
    assert(day1.length == 1)
    assert(math.abs(day1(0).getAs[Double]("metric_value") - 10.0) < 1e-9,
      s"late row must be dropped: got ${day1(0)}")
  }

  test("tier-2 update mode emits per-batch corrections that converge to the batch gold") {
    val root = graft.TestTmp.dir("graft-upd")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("reading_time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("metric_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("metric_value", org.apache.spark.sql.types.DoubleType)))
    def feed(rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("t", "metric_name", "metric_value")
        .withColumn("reading_time", to_timestamp(col("t")))
        .select("reading_time", "metric_name", "metric_value")
        .write.mode("append").parquet(s"$root/in")
    feed(Seq(
      ("2022-04-14 10:00:00", "Voltage", 1.0),
      ("2022-04-14 10:00:00", "Current", 10.0)))
    val stream = spark.readStream.schema(schema).parquet(s"$root/in")
    val q = StreamingPipeline.dailyPowerStreaming(stream).writeStream
      .outputMode("update").format("memory")
      .queryName("upd_out").option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    val afterB1 = spark.table("upd_out").collect()
    assert(afterB1.length == 1 &&
      math.abs(afterB1(0).getAs[Double]("metric_value") - 10.0) < 1e-9,
      "update mode emits the day's current value without waiting for the watermark")
    // a second batch revises the SAME day: update mode must re-emit the
    // corrected row (append mode would stay silent until the watermark)
    feed(Seq(("2022-04-14 11:00:00", "Voltage", 3.0)))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("upd_out").collect()
    assert(all.length == 2, s"one correction row per updating batch, got ${all.length}")
    // avg V = 2.0, avg C = 10.0 → corrected Power 20.0 == batch recompute
    assert(math.abs(all.last.getAs[Double]("metric_value") - 20.0) < 1e-9,
      s"latest emission must equal the batch value: ${all.mkString(";")}")
  }

  test("update-mode gold through TxTable: per-batch atomic day commits converge to batch gold") {
    val root = graft.TestTmp.dir("graft-updgold")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("reading_time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("metric_name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("metric_value", org.apache.spark.sql.types.DoubleType)))
    def feed(rows: Seq[(String, String, Double)]): Unit =
      rows.toDF("t", "metric_name", "metric_value")
        .withColumn("reading_time", to_timestamp(col("t")))
        .select("reading_time", "metric_name", "metric_value")
        .write.mode("append").parquet(s"$root/in")
    def run(): Unit = StreamingPipeline.runDailyPowerUpdateToGold(
      spark.readStream.schema(schema).parquet(s"$root/in"),
      s"$root/gold", s"$root/ckpt")
    def goldNow(): Map[String, Double] =
      graft.pipeline.TxTable.read(spark, s"$root/gold")
        .select(col("reading_date").cast("string"), col("metric_value"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    feed(Seq(
      ("2022-04-14 10:00:00", "Voltage", 1.0),
      ("2022-04-14 10:00:00", "Current", 10.0)))
    run()
    assert(goldNow() == Map("2022-04-14" -> 10.0))

    // in-watermark correction of day 14 + a new day 15, one more drain:
    // the batch's update-mode output (both days' CURRENT content)
    // commits atomically through the manifest log
    feed(Seq(
      ("2022-04-14 11:00:00", "Voltage", 3.0),
      ("2022-04-15 09:00:00", "Voltage", 2.0),
      ("2022-04-15 09:00:00", "Current", 10.0)))
    run()
    val g = goldNow()
    assert(math.abs(g("2022-04-14") - 20.0) < 1e-9, s"corrected day: $g") // avg V 2.0 * 10
    assert(math.abs(g("2022-04-15") - 20.0) < 1e-9, s"new day: $g")
    // the manifest log advanced once per updating batch — time travel
    // back to the first commit still shows the uncorrected day
    val v1 = graft.pipeline.TxTable.readAt(spark, s"$root/gold", 1)
      .select(col("metric_value")).collect().map(_.getDouble(0)).toSeq
    assert(v1 == Seq(10.0), "version 1 frozen at the pre-correction value")
  }

  test("stream-stream interval join attributes facts to in-window dims; out-of-window pairs never match") {
    val root = graft.TestTmp.dir("graft-ssj")
    val clickSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("click_time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("click_id", org.apache.spark.sql.types.LongType)))
    val impSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("imp_time", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("imp_id", org.apache.spark.sql.types.LongType)))
    Seq(
      (1L, "2022-04-14 10:00:30", 100L), // 30s after imp 1 — in window
      (1L, "2022-04-14 10:20:00", 101L), // 20min after — OUT of window
      (2L, "2022-04-14 10:00:10", 200L)) // user 2 has no impression
      .toDF("user_id", "t", "click_id")
      .withColumn("click_time", to_timestamp(col("t")))
      .select("user_id", "click_time", "click_id")
      .write.mode("append").parquet(s"$root/clicks")
    Seq((1L, "2022-04-14 10:00:00", 900L))
      .toDF("user_id", "t", "imp_id")
      .withColumn("imp_time", to_timestamp(col("t")))
      .select("user_id", "imp_time", "imp_id")
      .write.mode("append").parquet(s"$root/imps")

    val joined = StreamingPipeline.streamStreamIntervalJoin(
      spark.readStream.schema(clickSchema).parquet(s"$root/clicks"),
      spark.readStream.schema(impSchema).parquet(s"$root/imps"),
      key = "user_id", factTs = "click_time", dimTs = "imp_time",
      maxDelaySeconds = 300)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    // advance both watermarks so the matched pair is emitted
    Seq((9L, "2022-04-14 12:00:00", 999L)).toDF("user_id", "t", "click_id")
      .withColumn("click_time", to_timestamp(col("t")))
      .select("user_id", "click_time", "click_id")
      .write.mode("append").parquet(s"$root/clicks")
    Seq((9L, "2022-04-14 12:00:00", 998L)).toDF("user_id", "t", "imp_id")
      .withColumn("imp_time", to_timestamp(col("t")))
      .select("user_id", "imp_time", "imp_id")
      .write.mode("append").parquet(s"$root/imps")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_out")
      .select("click_id", "imp_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((100L, 900L)), s"in-window click must attribute, got $rows")
    assert(!rows.exists(_._1 == 101L), "beyond-interval click must not match")
    assert(!rows.exists(_._1 == 200L), "keyless click must not match")
    assert(rows.contains((999L, 998L)),
      s"same-instant watermark-advancer pair joins too: $rows")
  }

  test("streaming dedup with watermark + stream-static dim join") {
    val root = graft.TestTmp.dir("graft-sdedup")
    val in = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:00:00", 1.0), // exact duplicate delivery
      (2L, "2024-01-01 10:05:00", 2.0),
      (2L, "2024-01-01 10:06:00", 2.5)) // same key, different event time: kept
      .toDF("sensor_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .select("sensor_id", "ts", "value")
    in.write.mode("overwrite").parquet(s"$root/in")

    val dim = Seq((1L, "hall"), (2L, "roof")).toDF("sensor_id", "location")
    val stream = spark.readStream.schema(in.schema).parquet(s"$root/in")
      // streaming exactly-once dedup on (key, event-time) with bounded
      // state via watermark; then enrich against a static dim (no state)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("sensor_id", "ts")
      .join(dim, "sensor_id")
    val q = stream.writeStream
      .outputMode("append").format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sdedup_out").collect()
    assert(rows.length == 3, s"duplicate delivery dropped, distinct times kept: ${rows.mkString}")
    assert(rows.forall(r => Seq("hall", "roof").contains(r.getAs[String]("location"))))
  }

  test("gold advances per micro-batch and stays in parity with a full batch recompute, including late data") {
    import graft.pipeline.SensorPipeline
    val root = graft.TestTmp.dir("graft-stream-gold")
    val bronzeDir = s"$root/bronze"
    val silverPath = s"$root/silver"
    val goldPath = s"$root/gold"
    val ckpt = s"$root/ckpt"
    new java.io.File(bronzeDir).mkdirs()

    def goldSet(): Set[(String, Double)] =
      graft.pipeline.TxTable.read(spark, goldPath)
        .select(col("reading_date").cast("string"), col("metric_value"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    def batchRecompute(): Set[(String, Double)] =
      SensorPipeline.silverToGold(spark.read.parquet(silverPath))
        .select(col("reading_date").cast("string"), col("metric_value"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSet

    // batch 1: one full day -> gold must exist MID-STREAM (no
    // goldAfterDrain call anywhere in this test)
    Files.writeString(
      java.nio.file.Paths.get(s"$bronzeDir/b1.txt"),
      "1649941817 Voltage 1.34\n1649941818 Voltage 1.35\n1649941817 Current 12.0\n1649941818 Current 14.0\n")
    StreamingPipeline.runBronzeToSilverAvailableNow(
      spark, bronzeDir, silverPath, ckpt, goldPath = Some(goldPath))
    val g1 = goldSet()
    assert(g1 == batchRecompute(), "micro-batch gold == batch recompute")
    assert(g1.map(_._1) == Set("2022-04-14"))
    assert(math.abs(g1.head._2 - 17.485) < 1e-9)

    // batch 2: LATE reading for the already-computed day plus a new day
    // -> unbounded-lateness contract: old day re-aggregated from ALL its
    // silver rows, new day appears; both in the same drain
    Files.writeString(
      java.nio.file.Paths.get(s"$bronzeDir/b2.txt"),
      "1649941819 Voltage 2.01\n1650028217 Voltage 2.0\n1650028217 Current 10.0\n")
    StreamingPipeline.runBronzeToSilverAvailableNow(
      spark, bronzeDir, silverPath, ckpt, goldPath = Some(goldPath))
    val g2 = goldSet()
    assert(g2 == batchRecompute(),
      "after late data: per-batch incremental gold == full recompute from silver")
    assert(g2.map(_._1) == Set("2022-04-14", "2022-04-15"))
    val day14 = g2.find(_._1 == "2022-04-14").get._2
    val expected14 = ((1.34 + 1.35 + 2.01) / 3.0) * ((12.0 + 14.0) / 2.0)
    assert(math.abs(day14 - expected14) < 1e-9, "late reading re-aggregated the whole day")
  }

  test("goldTxCommit refuses to silently shadow a pre-existing flat parquet gold") {
    val root = graft.TestTmp.dir("graft-goldfmt")
    Seq((1L, "x")).toDF("a", "b").write.parquet(s"$root/silver")
    // old on-disk format: a flat parquet table at the gold path
    Seq((1L, 2.0)).toDF("k", "v").write.parquet(s"$root/gold")
    val ex = intercept[IllegalStateException](
      StreamingPipeline.goldTxCommit(spark, s"$root/silver", s"$root/gold"))
    assert(ex.getMessage.contains("flat parquet"), ex.getMessage)
  }

  test("sessions -> gold: closed sessions maintain a per-day session mart incrementally via TxTable") {
    import graft.streaming.StatefulSessions.SessionEvent
    val root = graft.TestTmp.dir("graft-sess-gold")
    val in = Seq(
      // user 1: two sessions on Jan 1 (80-min gap between them)
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:10:00", 2.0),
      (1L, "2024-01-01 12:00:00", 3.0),
      // user 2: one session on Jan 1
      (2L, "2024-01-01 10:00:00", 9.0),
      // watermark driver far in the future: closes everything above
      (99L, "2024-01-03 00:00:00", 0.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .select("user_id", "ts", "value")
    in.write.mode("overwrite").parquet(s"$root/in")
    val stream = spark.readStream.schema(in.schema).parquet(s"$root/in").as[SessionEvent]
    StreamingPipeline.runSessionsToGold(
      stream, s"$root/sessions", s"$root/gold", s"$root/ckpt")

    val sessions = spark.read.parquet(s"$root/sessions")
    // user 1's first session (2 events, gap-closed) must be present;
    // exact totals depend on which timeouts fired before the drain ended
    assert(sessions.filter(col("user_id") === 1L && col("n") === 2).count() == 1)

    val gold = graft.pipeline.TxTable.read(spark, s"$root/gold")
      .select(col("session_date").cast("string"), col("n_sessions"), col("n_events"), col("total_value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // Jan 1 summary must aggregate ALL closed Jan-1 sessions — and must
    // equal a batch recompute from the sessions table (parity check)
    val expected = spark.read.parquet(s"$root/sessions")
      .withColumn("session_date", to_date(col("session_start")))
      .filter(col("session_date") === "2024-01-01")
      .agg(count(lit(1)), sum(col("n")), round(sum(col("total")), 6))
      .collect()(0)
    assert(gold.contains("2024-01-01"))
    assert(gold("2024-01-01") == ((expected.getLong(0), expected.getLong(1), expected.getDouble(2))),
      s"session gold ${gold("2024-01-01")} != batch recompute $expected")

    // idempotence: a second drain with no new data must not change gold
    StreamingPipeline.runSessionsToGold(
      stream, s"$root/sessions", s"$root/gold", s"$root/ckpt")
    val gold2 = graft.pipeline.TxTable.read(spark, s"$root/gold")
      .select(col("session_date").cast("string"), col("n_sessions"), col("n_events"), col("total_value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(gold2 == gold, "re-drain with no new files must be a no-op")
  }

  test("multimodal: real imageio/wav decode emits true properties; corrupt rows flagged not dropped") {
    import graft.ops.Multimodal
    val png = Multimodal.makeImage(42L, "png") // 8 + 42%16 = 18 wide, 8 + 2%16 = 10 tall
    val wav = Multimodal.makeWav(7L) // 200 + 7%600 = 207 frames @ 8kHz
    val media = Seq(
      Multimodal.MediaRecord(1L, "image", png, 1L),
      Multimodal.MediaRecord(2L, "audio", wav, 2L),
      Multimodal.MediaRecord(3L, "video", Array.emptyByteArray, 3L),
      Multimodal.MediaRecord(4L, "exotic", "x".getBytes("UTF-8"), 4L),
      Multimodal.MediaRecord(5L, "image", "not an image".getBytes("UTF-8"), 5L),
      Multimodal.MediaRecord(6L, "audio", "not audio".getBytes("UTF-8"), 6L)).toDS()
    val f = Multimodal.extractFeatures(media).collect().map(r => r.media_id -> r).toMap
    assert(f(1L).ok, "real PNG decodes")
    assert(f(1L).width.contains(18) && f(1L).height.contains(10),
      s"javax.imageio must report the true encoded dims, got ${f(1L).width}x${f(1L).height}")
    assert(f(1L).lum_mean.exists(l => l > 0 && l < 255), "decoded mean luminance in range")
    assert(f(2L).ok && f(2L).width.isEmpty, "real WAV decodes, no image dims")
    assert(f(2L).sample_rate.contains(8000) && f(2L).n_frames.contains(207L),
      s"javax.sound must report the true header facts, got " +
        s"${f(2L).sample_rate}Hz ${f(2L).n_frames}fr")
    // sine amplitude 12000/32768 ≈ 0.366 → RMS ≈ 0.366/√2 ≈ 0.26
    assert(f(2L).rms.exists(r => r > 0.2 && r < 0.32),
      s"sine RMS ≈ 0.26 expected: ${f(2L).rms}")
    assert(!f(3L).ok, "empty payload flagged")
    assert(!f(4L).ok, "unknown media type flagged")
    assert(!f(5L).ok, "corrupt image flagged, not dropped")
    assert(f(5L).n_bytes == 12L, "byte stats survive a failed decode")
    assert(!f(6L).ok && f(6L).sample_rate.isEmpty, "corrupt audio flagged, not dropped")
    // features survive a round through the full query surface; every
    // image row must carry genuine decoded dimensions
    val viaQuery = graft.SparkEntry.queries("q_multimodal_features")(spark, "/root/testdata/sf0.001")
    assert(viaQuery.count() == 500)
    assert(viaQuery.filter(col("ok") === false).count() == 0)
    val images = viaQuery.filter(col("media_type") === "image")
    assert(images.count() > 0)
    assert(images.filter(col("width").isNull || col("height").isNull).count() == 0)
    // dims follow the deterministic generator: w = 8 + id%16, h = 8 + (id/16)%16
    assert(images.filter(
      col("width") =!= (lit(8) + col("media_id") % 16).cast("int") ||
        col("height") =!= (lit(8) + (col("media_id").cast("long") / 16 % 16).cast("int"))).count() == 0,
      "decoded dims must equal the generated dims for every image")
    // every audio row decodes through the real WAV path with true header facts
    val audio = viaQuery.filter(col("media_type") === "audio")
    assert(audio.count() > 0)
    assert(audio.filter(col("sample_rate") =!= 8000).count() == 0,
      "decoded sample rate must equal the generator's 8 kHz")
    assert(audio.filter(
      col("n_frames") =!= (lit(200) + col("media_id") % 600).cast("long")).count() == 0,
      "decoded frame count must equal the generated frame count")
    // every video row parses through the real AVI/MJPEG container path:
    // dims from avih, frame count from the movi chunks, fps from the
    // header timing — all matching the generator's formulas
    val video = viaQuery.filter(col("media_type") === "video")
    assert(video.count() > 0)
    assert(video.filter(
      col("width") =!= (lit(8) + col("media_id") % 16).cast("int") ||
        col("height") =!= (lit(8) + (col("media_id").cast("long") / 16 % 16).cast("int")).cast("int")).count() == 0,
      "decoded AVI dims must equal the generated dims")
    assert(video.filter(
      col("n_frames") =!= (lit(3) + col("media_id") % 5).cast("long")).count() == 0,
      "decoded frame count must equal the generated movi chunk count")
    assert(video.filter(
      col("sample_rate") =!= (lit(10) + col("media_id") % 15).cast("int")).count() == 0,
      "decoded fps must equal the generated header timing")
    // lum_mean is no longer in the query projection (the oracled columns
    // are the id-derivable round-trip facts) — check it on the full frame
    assert(graft.ops.Multimodal.mediaFeatures(spark, "/root/testdata/sf0.001")
      .filter(col("media_type") === "video").filter(col("lum_mean").isNull).count() == 0,
      "first MJPEG frame must decode to a real luminance")
  }

  test("multimodal video: AVI container decode facts and corrupt-container flagging") {
    import graft.ops.Multimodal
    val avi = Multimodal.makeAvi(37L)
    // seed 37: w=8+37%16=13, h=8+(37/16)%16=10, frames=3+37%5=5, fps=10+37%15=17
    val (w, h, fps, frames, lum) = Multimodal.decodeAvi(avi).get
    assert((w, h, fps, frames) == (13, 10, 17, 5), s"got ($w,$h,$fps,$frames)")
    assert(lum > 0 && lum < 255)
    assert(Multimodal.decodeAvi("RIFFxxxxAVI corrupt".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeAvi(Multimodal.makeWav(3L)).isEmpty,
      "a RIFF/WAVE file is not an AVI")
    // truncated container: parser must fail cleanly, not throw
    assert(Multimodal.decodeAvi(java.util.Arrays.copyOfRange(avi, 0, avi.length / 2)).isEmpty)
  }
}
