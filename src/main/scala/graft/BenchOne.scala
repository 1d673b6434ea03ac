package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions).master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    SparkEntry.entry(spark).count()
    for (q <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"$q: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
