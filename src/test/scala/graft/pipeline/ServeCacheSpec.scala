package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[ServeCache]]: the driver-side pinned-snapshot tier must be
  * byte-for-byte the [[Serve.range]] Spark path (same parsing, same
  * rejects, same rows in the same order), and its staleness contract
  * must hold — version-pinned reads, manifest-driven refresh, atomic
  * snapshot swap, bounded collect.
  */
class ServeCacheSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkFrames(extraDay: Boolean = false) = {
    val silverRows = Seq(
      ("2024-01-01", "2024-01-01 00:10:00.123456", "click", 1.5),
      ("2024-01-01", "2024-01-01 09:00:00.000001", "view", 2.0),
      ("2024-01-02", "2024-01-02 12:00:00.5", "click", 3.25),
      ("2024-01-03", "2024-01-03 23:59:59.999", "view", 4.0)) ++
      (if (extraDay) Seq(("2024-01-04", "2024-01-04 01:02:03.004", "click", 9.0))
       else Nil)
    val goldRows = Seq(
      ("2024-01-01", "2024-01-01 00:00:00", "Power", 3.0),
      ("2024-01-02", "2024-01-02 00:00:00", "Power", 6.5),
      ("2024-01-03", "2024-01-03 00:00:00", "Power", 8.25))
    def df(rows: Seq[(String, String, String, Double)]) =
      rows.toDF("reading_date", "ts", "metric_name", "metric_value")
        .select(col("reading_date"), to_timestamp(col("ts")).as("reading_time"),
          col("metric_name"), col("metric_value"))
    (df(silverRows), df(goldRows))
  }

  private def sparkPath(
      silver: org.apache.spark.sql.DataFrame, gold: org.apache.spark.sql.DataFrame,
      f: Option[String], t: Option[String]): Either[String, Seq[(String, String, Double)]] =
    Serve.range(silver, gold, f, t).map(_.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq)

  test("cached range equals the Spark serve path across range shapes and reject cases") {
    val (silver, gold) = mkFrames()
    val cache = ServeCache.fromFrames(silver, gold)
    val cases = Seq(
      (Some("2024-01-01"), Some("2024-01-02")), // date-only to => inclusive day
      (Some("2024-01-01"), Some("2024-01-01")), // single day
      (Some("2024-01-02"), Some("2024-01-03")),
      (Some("2023-12-01"), Some("2024-02-01")), // superset
      (Some("2024-02-01"), Some("2024-02-05")), // empty
      (Some("2024-01-01T00:00:00"), Some("2024-01-02T00:00:00")), // iso datetime
      (None, Some("2024-01-02")), // missing param
      (Some("2024-01-01"), None),
      (Some("not-a-date"), Some("2024-01-02"))) // invalid format
    cases.foreach { case (f, t) =>
      val viaSpark = sparkPath(silver, gold, f, t)
      val viaCache = cache.range(f, t)
      assert(viaCache === viaSpark, s"divergence for ($f, $t)")
    }
    // and the happy path actually returns interleaved silver+gold rows
    // in (time, name) order with ms-truncated ISO formatting
    val got = cache.range(Some("2024-01-01"), Some("2024-01-01")).toOption.get
    assert(got === Seq(
      ("2024-01-01T00:00:00.000Z", "Power", 3.0),
      ("2024-01-01T00:10:00.123Z", "click", 1.5),
      ("2024-01-01T09:00:00.000Z", "view", 2.0)))
  }

  test("staleness contract: version-pinned reads, manifest-driven refresh, no-op when current") {
    val base = graft.TestTmp.dir("serve-cache")
    val (sRoot, gRoot) = (s"$base/silver", s"$base/gold")
    val (silver, gold) = mkFrames()
    TxTable.commit(spark, sRoot, silver, "reading_date")
    TxTable.commit(spark, gRoot, gold, "reading_date")

    val cache = ServeCache.fromTxTables(spark, sRoot, gRoot)
    assert(cache.version === (1L, 1L))
    assert(cache.range(Some("2024-01-04"), Some("2024-01-04")).toOption.get.isEmpty)
    assert(!cache.refreshIfStale(), "refresh must be a no-op at the latest versions")

    // a new silver commit: the cache KEEPS serving the pinned version
    // until refresh — then serves the new one, atomically
    val (silver2, _) = mkFrames(extraDay = true)
    TxTable.appendCommit(spark, sRoot,
      silver2.filter(col("reading_date") === "2024-01-04"), "reading_date")
    assert(cache.version === (1L, 1L), "reads stay version-pinned after a commit")
    assert(cache.range(Some("2024-01-04"), Some("2024-01-04")).toOption.get.isEmpty,
      "stale reads serve the pinned snapshot, not a mix")
    assert(cache.refreshIfStale(), "refresh must observe the new manifest version")
    assert(cache.version === (2L, 1L))
    assert(cache.range(Some("2024-01-04"), Some("2024-01-04")).toOption.get ===
      Seq(("2024-01-04T01:02:03.004Z", "click", 9.0)))
    assert(!cache.refreshIfStale())

    // post-refresh parity with the Spark path over the committed tables
    val viaSpark = sparkPath(
      TxTable.read(spark, sRoot), TxTable.read(spark, gRoot),
      Some("2024-01-01"), Some("2024-01-04"))
    assert(cache.range(Some("2024-01-01"), Some("2024-01-04")) === viaSpark)
  }

  test("concurrent readers during refresh swaps: every read is one whole snapshot, never a mix") {
    // writer commits day k with value k then refreshes; 8 reader
    // threads hammer the full span. The snapshot swap is a single
    // volatile write, so every response must expose a version PREFIX:
    // appended days present = exactly {1..k} for some k, each with its
    // own value — a gap or a value/day mismatch is a torn read.
    val base = graft.TestTmp.dir("serve-cache-conc")
    val (sRoot, gRoot) = (s"$base/silver", s"$base/gold")
    val (silver, gold) = mkFrames()
    TxTable.commit(spark, sRoot, silver, "reading_date")
    TxTable.commit(spark, gRoot, gold, "reading_date")
    val cache = ServeCache.fromTxTables(spark, sRoot, gRoot)

    val nDays = 12
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var writing = true
    val readers = (1 to 8).map { _ =>
      new Thread(() => {
        while (writing) {
          cache.range(Some("2025-03-01"), Some("2025-03-28")) match {
            case Left(msg) => failures.add(s"reject mid-swap: $msg"); ()
            case Right(rows) =>
              val days = rows.map(_._1.substring(8, 10).toInt)
              val vals = rows.map(_._3)
              if (days != (1 to days.size).toSeq)
                failures.add(s"non-prefix day set: $days")
              else if (vals != days.map(_.toDouble))
                failures.add(s"value/day mismatch: ${days.zip(vals)}")
              ()
          }
        }
      })
    }
    readers.foreach(_.start())
    (1 to nDays).foreach { day =>
      val d = f"2025-03-$day%02d"
      TxTable.appendCommit(spark, sRoot,
        Seq((d, s"$d 00:00:01", "click", day.toDouble))
          .toDF("reading_date", "ts", "metric_name", "metric_value")
          .select(col("reading_date"), to_timestamp(col("ts")).as("reading_time"),
            col("metric_name"), col("metric_value")),
        "reading_date")
      assert(cache.refreshIfStale(), s"refresh must observe day $day's commit")
    }
    writing = false
    readers.foreach(_.join())
    assert(failures.isEmpty, s"torn reads: ${failures.toArray.take(3).mkString("; ")}")
    val fin = cache.range(Some("2025-03-01"), Some("2025-03-28")).toOption.get
    assert(fin.size == nDays && fin.map(_._3) == (1 to nDays).map(_.toDouble))
  }

  test("bounded collect: a store above maxRows refuses to build; a date/time mismatch fails loudly") {
    val (silver, gold) = mkFrames()
    val e1 = intercept[IllegalArgumentException] {
      ServeCache.fromFrames(silver, gold, maxRows = 3)
    }
    assert(e1.getMessage.contains("cache bound"))

    // a store row whose reading_date is NOT date(reading_time) breaks
    // the response-order invariant and must be rejected at load
    val bad = silver.unionByName(
      Seq(("2024-01-09", "2024-01-01 00:00:00", "click", 1.0))
        .toDF("reading_date", "ts", "metric_name", "metric_value")
        .select(col("reading_date"), to_timestamp(col("ts")).as("reading_time"),
          col("metric_name"), col("metric_value")))
    val e2 = intercept[IllegalArgumentException] {
      ServeCache.fromFrames(bad, gold)
    }
    assert(e2.getMessage.contains("misorder"))
  }
}
