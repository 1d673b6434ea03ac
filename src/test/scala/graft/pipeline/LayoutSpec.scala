package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Physical-layout behavior: partition pruning on the silver layout,
  * shuffle-free bucketed joins, and the typed Aggregator parity.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("silver partitioned by reading_date: range scan prunes partitions; dynamic overwrite touches only changed days") {
    val root = graft.TestTmp.dir("graft-layout")
    val silver = Seq(
      (1L, "2022-04-14 13:10:17", "Voltage", 1.34, "2022-04-14"),
      (2L, "2022-04-15 09:00:00", "Voltage", 1.50, "2022-04-15"),
      (3L, "2022-04-16 10:00:00", "Current", 12.0, "2022-04-16"))
      .toDF("raw_id", "t", "metric_name", "metric_value", "d")
      .withColumn("reading_time", to_timestamp(col("t")))
      .withColumn("reading_date", to_date(col("d")))
      .withColumn("processed_at", to_timestamp(lit("2022-04-16 12:00:00")))
      .select("raw_id", "reading_time", "metric_name", "metric_value", "reading_date", "processed_at")
    TableLayout.writeSilverPartitioned(silver, s"$root/silver")

    // layout: one dir per day
    val dirs = new java.io.File(s"$root/silver").listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("reading_date=2022-04-14", "reading_date=2022-04-15", "reading_date=2022-04-16"))

    // pruning asserted on the CONTENTS of PartitionFilters — the scan
    // node always prints the label (even empty), so a bare substring
    // match passes vacuously; and DataFrame.inputFiles lists the whole
    // relation pre-pruning, so it can't be used either
    val scan = spark.read.parquet(s"$root/silver")
      .filter(col("reading_date") >= "2022-04-15" && col("reading_date") < "2022-04-16")
    assert(scan.count() == 1)
    val plan = scan.queryExecution.executedPlan.toString
    val pf = plan.split("PartitionFilters: \\[")(1).split("\\]")(0)
    assert(pf.contains("reading_date"),
      s"range predicate must land in PartitionFilters, got: [$pf]")

    // dynamic overwrite of one day leaves the others untouched
    val day2 = silver.filter(col("reading_date") === "2022-04-15")
      .withColumn("metric_value", lit(9.99))
    TableLayout.writeSilverPartitioned(day2, s"$root/silver")
    val after = spark.read.parquet(s"$root/silver")
    assert(after.count() == 3)
    assert(after.filter(col("reading_date") === "2022-04-15").head.getAs[Double]("metric_value") == 9.99)
    assert(after.filter(col("reading_date") === "2022-04-14").head.getAs[Double]("metric_value") == 1.34)
  }

  test("bucketed join elides the shuffle on both sides") {
    // (warehouse dir is a static conf — set to a temp dir in SparkTestSession)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to observe exchanges
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .withColumnRenamed("c_custkey", "o_custkey")
      TableLayout.writeBucketed(orders, "orders_b", "o_custkey", 4)
      TableLayout.writeBucketed(customer, "customer_b", "o_custkey", 4)
      val joined = TableLayout.bucketedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should have no shuffle:\n$plan")
      // same result as the plain join
      val plain = orders.join(customer, "o_custkey")
      assert(joined.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("compaction: many small files -> few target-size files, identical data") {
    val root = graft.TestTmp.dir("graft-compact")
    val df = spark.range(0, 10000).toDF("id").withColumn("v", col("id") * 2)
    df.repartition(50).write.parquet(s"$root/t") // 50 tiny files
    val before = spark.read.parquet(s"$root/t")
    assert(before.inputFiles.length == 50)
    val sumBefore = before.agg(sum("v")).head.getLong(0)
    TableLayout.compact(spark, s"$root/t", targetFileMB = 256)
    val after = spark.read.parquet(s"$root/t")
    assert(after.inputFiles.length < 5, s"expected few files, got ${after.inputFiles.length}")
    assert(after.count() == 10000 && after.agg(sum("v")).head.getLong(0) == sumBefore)
  }

  test("typed PowerAggregator matches the untyped pivot on the golden batch") {
    import graft.functions.PowerAggregator
    val readings = Seq(
      ("Voltage", 1.34), ("Voltage", 1.35), ("Current", 12.0), ("Current", 14.0)).toDS()
    val power = readings.select(PowerAggregator.toColumn).head()
    assert(math.abs(power - 17.485) < 1e-9)
    // one-sided input -> NaN (caller filters, like the gold guard)
    val oneSided = Seq(("Voltage", 1.0)).toDS()
    assert(oneSided.select(PowerAggregator.toColumn).head().isNaN)
  }
}
