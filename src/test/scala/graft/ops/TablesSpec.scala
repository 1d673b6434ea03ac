package graft.ops

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contracts for the schema-adaptive driver-table loaders (round 7).
  *
  * The round-6 driver regeneration silently flipped `events.ts` from
  * parquet INT64 TIMESTAMP(NANOS) to native timestamp[us] and the old
  * loader surfaced that as 40 opaque per-query analysis errors. These
  * specs pin the three behaviors that prevent a repeat:
  *
  *  1. BOTH layouts load to the same canonical contract — `ts` is a
  *     µs-precision session-tz TimestampType holding the same instant,
  *     next to a raw pushdown-carrier column (`ts_ntz` / `ts_ns`).
  *  2. Range predicates built by [[Tables.tsBetween]] reach the parquet
  *     scan as pushed filters on the RAW column (a predicate on the
  *     cast `ts` would not push — the reason the carrier exists).
  *  3. Any third layout or unknown column fail-fasts with ONE error
  *     naming table/column/found-vs-expected, not N query errors.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Write `df` as `<tmp>/events.parquet` and return the tmp dir. */
  private def eventsDir(df: org.apache.spark.sql.DataFrame): String = {
    val d = graft.TestTmp.dir("graft-tables")
    df.write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def nativeDir(): String = {
    import spark.implicits._
    // 2024-01-10T00:00:00.123456Z and one event a day later
    eventsDir(Seq(
      (1L, "2024-01-10 00:00:00.123456", 7L, "view", 1.0),
      (2L, "2024-01-11 00:00:00.999999", 7L, "click", 2.0)
    ).toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
      .select("event_id", "ts", "user_id", "event_type", "value"))
  }

  test("native µs layout: canonical ts preserves the instant, ts_ntz carrier kept") {
    val ev = Tables.events(spark, nativeDir())
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.columns.contains("ts_ntz"))
    val got = ev.orderBy("event_id").select(unix_micros(col("ts"))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().toSeq
    val want = Seq("2024-01-10T00:00:00.123456Z", "2024-01-11T00:00:00.999999Z")
      .map(s => Instant.parse(s).getEpochSecond * 1000000L + Instant.parse(s).getNano / 1000L)
    assert(got == want, s"UTC session tz must make the NTZ cast instant-preserving: $got")
  }

  test("legacy nanos layout: ts is the µs truncation, ts_ns carrier kept") {
    import spark.implicits._
    // raw INT64 nanos (how nanosAsLong presents the old TIMESTAMP(NANOS));
    // 999 trailing ns must TRUNCATE away, matching DuckDB's ts::TIMESTAMP
    val base = Instant.parse("2024-01-10T00:00:00.123456Z")
    val ns = base.getEpochSecond * 1000000000L + base.getNano + 999L
    val d = eventsDir(Seq((1L, ns, 7L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val ev = Tables.events(spark, d)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.columns.contains("ts_ns"))
    val got = ev.select(unix_micros(col("ts"))).head().getLong(0)
    assert(got == ns / 1000L, s"µs truncation mismatch: $got vs ${ns / 1000L}")
  }

  test("tsBetween pushes to the parquet scan on both layouts") {
    val from = Instant.parse("2024-01-10T00:00:00Z")
    val to = Instant.parse("2024-01-11T00:00:00Z")

    val nat = Tables.events(spark, nativeDir())
    val natPlan = nat.filter(Tables.tsBetween(nat, from, to))
      .queryExecution.executedPlan.toString
    assert(natPlan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"native-layout range must push on the raw NTZ column:\n$natPlan")
    assert(nat.filter(Tables.tsBetween(nat, from, to)).count() == 1L)

    import spark.implicits._
    val legDir = eventsDir(Seq(
      (1L, from.getEpochSecond * 1000000000L + 5L, 7L, "view", 1.0),
      (2L, to.getEpochSecond * 1000000000L + 5L, 7L, "click", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value"))
    val leg = Tables.events(spark, legDir)
    val legPlan = leg.filter(Tables.tsBetween(leg, from, to))
      .queryExecution.executedPlan.toString
    assert(legPlan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"legacy-layout range must push on the raw long column:\n$legPlan")
    assert(leg.filter(Tables.tsBetween(leg, from, to)).count() == 1L)
  }

  test("drift fail-fast: unknown column names the table and the expected set") {
    import spark.implicits._
    val d = eventsDir(Seq((1L, "x")).toDF("event_id", "surprise_col"))
    val e = intercept[IllegalStateException](Tables.events(spark, d))
    assert(e.getMessage.contains("events has unknown column surprise_col"), e.getMessage)
    assert(e.getMessage.contains("TESTDATA.md"), e.getMessage)
  }

  test("drift fail-fast: inadmissible ts encoding names found-vs-expected") {
    import spark.implicits._
    val d = eventsDir(Seq((1L, "2024-01-10")).toDF("event_id", "ts"))
    val e = intercept[IllegalStateException](Tables.events(spark, d))
    assert(e.getMessage.contains("events.ts is string"), e.getMessage)
  }

  test("subset fixtures load (spec-local parquet with fewer columns)") {
    import spark.implicits._
    val d = graft.TestTmp.dir("graft-tables")
    Seq((1L, "hello", "en")).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    assert(Tables.documents(spark, d).count() == 1L)
  }
}
