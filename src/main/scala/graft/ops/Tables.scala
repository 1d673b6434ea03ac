package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (TESTDATA.md).
  *
  * The one piece of real schema adaptation: `events.ts` is parquet
  * INT64 TIMESTAMP(NANOS), which Spark 4 refuses to read natively
  * ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos via
  * `spark.sql.legacy.parquet.nanosAsLong` and truncate to microseconds
  * (`timestamp_micros(ns div 1000)`) — bit-identical to DuckDB's
  * `ts::TIMESTAMP` truncation, which every oracle query uses on its side.
  */
object Tables {

  private def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = read(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = read(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = read(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = read(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = read(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")

  /** events with `ts` converted ns→µs TimestampType (UTC session tz).
    * `ts_ns` keeps the raw parquet long: predicates on it push down to
    * row-group min/max stats, which a predicate on the converted
    * timestamp cannot (the conversion expression blocks pushdown — only
    * IsNotNull reaches the scan otherwise).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, d, "events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Raw-ns range predicate for whole-second UTC bounds [from, to):
    * equivalent to filtering the µs-truncated timestamp, but pushes to
    * the parquet scan as a plain long comparison.
    */
  def tsNsRange(fromIso: String, toIso: String): org.apache.spark.sql.Column = {
    def ns(s: String) = java.time.LocalDate.parse(s)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond * 1000000000L
    col("ts_ns") >= ns(fromIso) && col("ts_ns") < ns(toIso)
  }
}
