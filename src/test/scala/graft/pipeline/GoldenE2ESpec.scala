package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The reference's golden end-to-end (scripts/test_all.sh:162-268):
  * POST 4 canonical lines → bronze=4 → silver=4 → gold=1 (Power 17.485)
  * → GET returns 5 ordered, formatted rows. Plus the incremental/merge
  * semantics: re-ingest is idempotent, late data recomputes its day.
  */
class GoldenE2ESpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val conftestLines = Seq(
    "1649941817 Voltage 1.34",
    "1649941818 Voltage 1.35",
    "1649941817 Current 12.0",
    "1649941818 Current 14.0")

  private def bronzeOf(lines: Seq[String], ingestedAt: String): org.apache.spark.sql.DataFrame =
    lines.zipWithIndex
      .map { case (l, i) => (i.toLong + 1, l, Timestamp.valueOf(ingestedAt)) }
      .toDF("id", "raw_line", "ingested_at")

  private val t0 = lit(Timestamp.valueOf("2022-04-14 14:00:00"))

  test("golden: 4 lines -> silver 4 -> gold 1 Power=17.485 -> serve 5 ordered rows") {
    val bronze = bronzeOf(conftestLines, "2022-04-14 13:30:00")
    val silver = SensorPipeline.bronzeToSilver(bronze, t0)
    assert(silver.count() == 4)

    val gold = SensorPipeline.silverToGold(silver, t0)
    val goldRows = gold.collect()
    assert(goldRows.length == 1)
    val power = goldRows(0).getAs[Double]("metric_value")
    // AVG(1.34,1.35) * AVG(12,14) = 1.345 * 13.0 = 17.485 (the reference's
    // golden rounds to 2dp — test_all.sh:248 — so assert at double tolerance)
    assert(math.abs(power - 17.485) < 1e-9, s"expected 17.485, got $power")
    assert(goldRows(0).getAs[String]("metric_name") == "Power")
    assert(goldRows(0).getAs[java.sql.Date]("reading_date").toString == "2022-04-14")
    assert(goldRows(0).getAs[Timestamp]("reading_time") == Timestamp.valueOf("2022-04-14 00:00:00"))

    val served = SensorPipeline.serve(silver, gold, "2022-04-14", "2022-04-15")
    val out = SensorPipeline.formatResponse(served).collect()
    val expected = Seq(
      ("2022-04-14T00:00:00.000Z", "Power", 17.485),
      ("2022-04-14T13:10:17.000Z", "Current", 12.0),
      ("2022-04-14T13:10:17.000Z", "Voltage", 1.34),
      ("2022-04-14T13:10:18.000Z", "Current", 14.0),
      ("2022-04-14T13:10:18.000Z", "Voltage", 1.35))
    assert(out.length == 5)
    out.zip(expected).foreach { case (row, (t, n, v)) =>
      assert(row.getString(0) == t && row.getString(1) == n)
      assert(math.abs(row.getDouble(2) - v) < 1e-9)
    }
  }

  test("invalid lines are dropped by silver validation (exact SQL semantics)") {
    val bad = Seq(
      "", "   ", "1649941817 Voltage", "Voltage 1.34",
      "-123 Voltage 1.34",
      "1649941817.5 Voltage 1.34", "notanumber Voltage 1.34",
      "1649941817 123Voltage 1.34", "1649941817 _Voltage 1.34",
      "1649941817 Voltage abc",
      "1649941817  Voltage 1.34", // doubled space: SPLIT_PART field 2 = '' -> rejected
      // python-accepted / SQL-rejected divergence fixtures
      "1649941817 Voltage 1e5", "1649941817 Voltage .5", "1649941817 Voltage inf")
    val bronze = bronzeOf(conftestLines ++ bad, "2022-04-14 13:30:00")
    assert(SensorPipeline.bronzeToSilver(bronze, t0).count() == 4)

    // SQL-vs-Python layering (stg_readings.sql has NO token-count check):
    // a 4-token line is rejected at the API edge (parse_line) but its
    // fields 1-3 pass the silver regexes — exactly the reference split
    val extraTok = "1649941817 Voltage 1.34 extra"
    assert(graft.parse.LineParser.parseLine(extraTok).isEmpty, "API edge rejects 4 tokens")
    val b2 = bronzeOf(Seq(extraTok), "2022-04-14 13:30:00")
    assert(SensorPipeline.bronzeToSilver(b2, t0).count() == 1, "silver SQL accepts fields 1-3")
  }

  test("merge is idempotent: re-ingesting the same raw_ids leaves one row per key") {
    val bronze = bronzeOf(conftestLines, "2022-04-14 13:30:00")
    val silver1 = SensorPipeline.bronzeToSilver(bronze, t0).cache()
    // second batch: same ids re-ingested with a corrected value
    val bronze2 = bronzeOf(Seq("1649941817 Voltage 9.99"), "2022-04-14 15:30:00")
    val t1 = lit(Timestamp.valueOf("2022-04-14 16:00:00"))
    val silver2 = SensorPipeline.bronzeToSilver(bronze2, t1)
    val merged = Merge.merge(silver1, silver2, Seq("raw_id"),
      Seq(col("processed_at").desc, col("reading_time").desc))
    assert(merged.count() == 4)
    val updated = merged.filter(col("raw_id") === 1).collect()(0)
    assert(updated.getAs[Double]("metric_value") == 9.99)
  }

  test("incremental: watermark skips already-processed bronze; late data recomputes its day") {
    val b1 = bronzeOf(conftestLines, "2022-04-14 13:30:00")
    val s1 = Incremental.silverIncrement(b1, None, t0).cache()
    assert(s1.count() == 4)
    val g1 = Incremental.goldIncrement(s1, None, t0).cache()
    assert(g1.count() == 1)

    // late reading for the same (historical) day, ingested later
    val late = Seq((5L, "1649941900 Voltage 2.01", Timestamp.valueOf("2022-04-14 17:00:00")))
      .toDF("id", "raw_line", "ingested_at")
    val b2 = b1.unionByName(late)
    val t1 = lit(Timestamp.valueOf("2022-04-14 18:00:00"))
    val s2 = Incremental.silverIncrement(b2, Some(s1), t1).cache()
    assert(s2.count() == 5, "only the late row passes the watermark; merge keeps 5")

    val g2 = Incremental.goldIncrement(s2, Some(g1), t1)
    val rows = g2.collect()
    assert(rows.length == 1)
    // whole-day recompute: AVG(1.34,1.35,2.01) * AVG(12,14)
    val expected = ((1.34 + 1.35 + 2.01) / 3.0) * 13.0
    assert(math.abs(rows(0).getAs[Double]("metric_value") - expected) < 1e-12)
  }

  test("response serializes to the reference's golden JSON shape (S5)") {
    val bronze = bronzeOf(conftestLines, "2022-04-14 13:30:00")
    val silver = SensorPipeline.bronzeToSilver(bronze, t0)
    val gold = SensorPipeline.silverToGold(silver, t0)
    val served = SensorPipeline.serve(silver, gold, "2022-04-14", "2022-04-15")
    val json = SensorPipeline.formatResponse(served).toJSON.collect()
    // FIXTURES.md golden (values at double precision; reference rounds
    // only for display)
    assert(json(0) == """{"time":"2022-04-14T00:00:00.000Z","name":"Power","value":17.485000000000003}""")
    assert(json(1) == """{"time":"2022-04-14T13:10:17.000Z","name":"Current","value":12.0}""")
    assert(json(4) == """{"time":"2022-04-14T13:10:18.000Z","name":"Voltage","value":1.35}""")
  }

  test("serve facade: reference param semantics — date-only to inclusive, invalid dates rejected, missing params rejected") {
    val bronze = bronzeOf(conftestLines, "2022-04-14 13:30:00")
    val silver = SensorPipeline.bronzeToSilver(bronze, t0)
    val gold = SensorPipeline.silverToGold(silver, t0)
    // golden query: ?from=2022-04-14&to=2022-04-14 (date-only to => inclusive)
    val ok = Serve.range(silver, gold, Some("2022-04-14"), Some("2022-04-14"))
    assert(ok.isRight)
    assert(ok.toOption.get.count() == 5)
    // datetime `to` is truncated (exclusive midnight) => same day excluded
    val empty = Serve.range(silver, gold, Some("2022-04-13"), Some("2022-04-14T13:10:17Z"))
    assert(empty.toOption.get.count() == 0)
    assert(Serve.range(silver, gold, None, Some("2022-04-15")).isLeft)
    assert(Serve.range(silver, gold, Some("not a date"), Some("2022-04-15")).isLeft)
    assert(Serve.range(silver, gold, Some("14-04-2022"), Some("2022-04-15")).isLeft)
  }

  test("quality gate: warn-level violations don't throw; error-level do") {
    val bronze = bronzeOf(conftestLines, "2022-04-14 13:30:00")
    val silver = SensorPipeline.bronzeToSilver(bronze, t0)
    val gold = SensorPipeline.silverToGold(silver, t0)
    assert(Quality.assertAll(gold, Quality.goldChecks).isEmpty)
    // negative power: severity warn -> returned, not thrown
    val negGold = gold.withColumn("metric_value", lit(-1.0))
    val warns = Quality.assertAll(negGold, Quality.goldChecks)
    assert(warns == Seq("power_non_negative" -> 1L))
    // out-of-domain metric name: severity error -> throws
    val badGold = gold.withColumn("metric_name", lit("Zap"))
    val ex = intercept[Quality.QualityFailure](Quality.assertAll(badGold, Quality.goldChecks))
    assert(ex.failing.exists(_._1 == "accepted_values_metric_name"))
  }

  test("quality checks: all pass on golden silver+gold; violations counted on corrupt data") {
    val bronze = bronzeOf(conftestLines, "2022-04-14 13:30:00")
    val silver = SensorPipeline.bronzeToSilver(bronze, t0)
    val gold = SensorPipeline.silverToGold(silver, t0)
    val sv = Quality.run(silver, Quality.silverChecks).collect()
    assert(sv.forall(_.getAs[Long]("violations") == 0L), sv.mkString(","))
    val gv = Quality.run(gold, Quality.goldChecks).collect()
    assert(gv.forall(_.getAs[Long]("violations") == 0L), gv.mkString(","))

    // corrupt: duplicate key + out-of-domain metric
    val corrupt = silver.unionByName(silver.limit(1))
      .unionByName(silver.limit(1).withColumn("metric_name", lit("Watts")))
    val cv = Quality.run(corrupt, Quality.silverChecks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cv("accepted_values_metric_name") == 1L)
    assert(cv("unique_raw_id") >= 2L)
  }
}
