package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Engine-layer row types + declared schemas.
  *
  * Mirrors the reference's three-layer medallion data model
  * (reference: scripts/init_db.sql:22-26, dbt/models/staging/stg_readings.sql:102-109,
  * dbt/models/marts/mart_daily_power.sql:71-87) re-expressed as Spark
  * `StructType`s and case classes (typed `Dataset[T]` where the reference
  * uses a typed dataclass, reference: src/api/routes/data.py:32-37).
  */
object Models {

  /** Bronze: raw ingested line + audit columns (init_db.sql:22-26). */
  final case class RawReading(id: Long, raw_line: String, ingested_at: Timestamp)

  /** The parse stage's typed IR (src/api/routes/data.py:32-37). */
  final case class ParsedReading(timestamp: Long, name: String, value: Double)

  /** Silver: validated, typed readings (stg_readings.sql:102-109). */
  final case class SilverReading(
      raw_id: Long,
      reading_time: Timestamp,
      metric_name: String,
      metric_value: Double,
      reading_date: Date,
      processed_at: Timestamp)

  /** Gold: one Power row per day (mart_daily_power.sql:71-87). */
  final case class GoldPower(
      metric_name: String,
      metric_value: Double,
      reading_date: Date,
      reading_time: Timestamp,
      calculated_at: Timestamp)

  val bronzeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("raw_line", StringType, nullable = true),
    StructField("ingested_at", TimestampType, nullable = false)))

  val silverSchema: StructType = StructType(Seq(
    StructField("raw_id", LongType, nullable = false),
    StructField("reading_time", TimestampType, nullable = false),
    StructField("metric_name", StringType, nullable = false),
    StructField("metric_value", DoubleType, nullable = false),
    StructField("reading_date", DateType, nullable = false),
    StructField("processed_at", TimestampType, nullable = false)))

  val goldSchema: StructType = StructType(Seq(
    StructField("metric_name", StringType, nullable = false),
    StructField("metric_value", DoubleType, nullable = false),
    StructField("reading_date", DateType, nullable = false),
    StructField("reading_time", TimestampType, nullable = false),
    StructField("calculated_at", TimestampType, nullable = false)))
}
