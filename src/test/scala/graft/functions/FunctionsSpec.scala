package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Tests for the native function layer: char-n-gram language ID and the
  * stateful streaming sessionizer.
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("langid detects the five profile languages on real sentences") {
    val samples = Map(
      "en" -> "the quick brown fox jumps over the lazy dog and runs into the woods",
      "es" -> "la historia de una ciudad que se encuentra en el centro del país",
      "de" -> "die geschichte einer stadt die sich in der mitte des landes befindet und schön ist",
      "fr" -> "les enfants de la ville sont dans une école près de la rivière",
      "zh" -> "我们在这个城市的中心有一个大的公园和很多人")
    samples.foreach { case (lang, text) =>
      assert(LangId.detect(text) == lang, s"expected $lang for: $text -> ${LangId.scores(text)}")
    }
  }

  test("langid edge cases: empty/null/garbage -> und") {
    assert(LangId.detect("") == "und")
    assert(LangId.detect(null) == "und")
    assert(LangId.detect("0923 4827 !!!") == "und")
  }

  test("lang_id column expression runs over documents") {
    import org.apache.spark.sql.functions._
    val df = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(LangIdFunctions.lang_id(col("text")).as("p"))
    // synthetic corpus is English-ish word salad: expect en-dominant, no nulls
    val counts = df.groupBy("p").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 500)
    assert(counts.getOrElse("en", 0L) > 250, s"expected en-dominant, got $counts")
  }

  test("cms_estimate: codegen and interpreted eval agree with the sketch API") {
    import org.apache.spark.sql.functions._
    val keys = Seq("a", "a", "a", "b", "b", "c")
    val df = spark.createDataFrame(keys.map(Tuple1(_))).toDF("k")
    val cms = df.stat.countMinSketch(col("k"), eps = 0.01, confidence = 0.99, seed = 7)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val bytes = bos.toByteArray
    def run(codegen: Boolean): Map[String, Long] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try df.distinct()
        .select(col("k"), HashFunctions.cms_estimate(col("k"), bytes).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val expected = Seq("a", "b", "c").map(k => k -> cms.estimateCount(k)).toMap
    assert(run(codegen = true) == expected)
    assert(run(codegen = false) == expected)
    assert(expected("a") >= 3L && expected("b") >= 2L && expected("c") >= 1L)
  }

  test("SQL registration: native expressions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT lang_id('the quick brown fox and the lazy dog of the hill') AS lang,
        |  simhash64(ngram_shingles('a b c d e', 2)) AS sh,
        |  minhash_sig(ngram_shingles('a b c d e', 2), 4) AS sig,
        |  rhp_bucket(array(0.1D, -0.2D, 0.3D), 4, 0) AS bucket""".stripMargin).head()
    assert(r.getString(0) == "en")
    assert(r.getSeq[Long](r.fieldIndex("sig")).length == 4)
    // deterministic across invocations
    val r2 = spark.sql("SELECT simhash64(ngram_shingles('a b c d e', 2)) AS sh").head()
    assert(r.getAs[Long]("sh") == r2.getAs[Long]("sh"))
    // round-3 registrations: dot_product and hilbert_index
    val r3 = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp, " +
        "hilbert_index(0, 0, 3) AS h0, hilbert_index(7, 0, 3) AS h63").head()
    assert(r3.getAs[Double]("dp") == 11.0)
    assert(r3.getAs[Long]("h0") == 0L)
    assert(r3.getAs[Long]("h63") ==
      graft.functions.HashKernels.hilbertIndex(3, 7, 0))
  }

  test("stateful sessionizer: batch semantics (gap closes, state carries)") {
    import graft.streaming.StatefulSessions._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Iterator(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 1.0),
      SessionEvent(1L, ts("2024-01-01 10:10:00"), 2.0),
      SessionEvent(1L, ts("2024-01-01 11:30:00"), 3.0), // gap 80min -> closes first
      SessionEvent(1L, ts("2024-01-01 11:40:00"), 4.0))
    // emulate one batch with no prior state
    val state = new TestGroupState[OpenSession]
    val closed = sessionize(1800L)(1L, events, state).toSeq
    assert(closed.length == 1)
    assert(closed.head.n == 2 && closed.head.total == 3.0)
    assert(closed.head.session_start == ts("2024-01-01 10:00:00"))
    assert(closed.head.session_end == ts("2024-01-01 10:10:00"))
    // open session retained in state
    assert(state.getOption.exists(s => s.n == 2 && s.total == 7.0))

    // a late event with an EARLIER timestamp must not rewind the session
    // end (next-batch delivery within the watermark)
    val late = Iterator(SessionEvent(1L, ts("2024-01-01 11:35:00"), 0.5))
    sessionize(1800L)(1L, late, state)
    assert(state.getOption.exists(s =>
      s.last == ts("2024-01-01 11:40:00") && s.n == 3 && s.total == 7.5),
      s"late event rewound state: ${state.getOption}")

    // event-time timeout: the open session must be EMITTED and the state
    // removed (not silently dropped)
    state.timedOut = true
    val emitted = sessionize(1800L)(1L, Iterator.empty, state).toSeq
    assert(emitted.length == 1, "timed-out open session must be emitted")
    assert(emitted.head.n == 3 && emitted.head.total == 7.5)
    assert(emitted.head.session_end == ts("2024-01-01 11:40:00"))
    assert(state.getOption.isEmpty, "state must be removed on timeout")
  }

  test("stateful sessionizer end-to-end over a file stream") {
    import graft.streaming.StatefulSessions._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = graft.TestTmp.dir("graft-sess")
    val in = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:10:00", 2.0),
      (1L, "2024-01-01 12:00:00", 3.0),
      (2L, "2024-01-01 10:00:00", 9.0),
      // watermark driver: far-future event advances event time so the
      // 12:00 session's timeout fires
      (99L, "2024-01-02 00:00:00", 0.0))
      .toDF("user_id", "t", "value")
      .withColumn("ts", to_timestamp(col("t")))
      .select("user_id", "ts", "value")
    in.write.mode("overwrite").parquet(s"$root/in")
    val stream = spark.readStream.schema(in.schema).parquet(s"$root/in").as[SessionEvent]
    val q = closedSessions(spark, stream).writeStream
      .outputMode("append").format("memory").queryName("sessions_out")
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions_out").as[ClosedSession].collect()
    // user 1's first session (2 events) closes via the gap within the batch
    assert(rows.exists(r => r.user_id == 1L && r.n == 2 && r.total == 3.0))
  }
}

/** Minimal GroupState stub for driving the pure state function in batch. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var value: Option[S] = None
  var timedOut = false
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newValue: S): Unit = { value = Some(newValue) }
  override def remove(): Unit = { value = None }
  override def hasTimedOut: Boolean = timedOut
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
