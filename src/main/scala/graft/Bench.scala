package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/file-index warm-up outside the timed region, so the
    // first query doesn't carry ~3s of session start-up in its number
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink, NOT count(): count() lets Catalyst prune every
      // projected expression and drop final sorts, so pure-projection
      // queries would time only the scan; noop materializes all columns
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            // surface the failure — a silently-swallowed broken query would
            // deflate the total and read as a performance improvement
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      // -1 sentinel for failures: elapsed-to-failure would make a
      // fast-failing query read as a fast run in the JSON
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
