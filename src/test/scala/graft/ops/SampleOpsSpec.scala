package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Weight-proportionality of the Efraimidis–Spirakis sampler: the hash
  * oracle proves Spark == DuckDB bit-for-bit; this pins that the sample
  * is actually WEIGHTED (higher-weight tiers overrepresented) and
  * reproducible.
  */
class SampleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("higher weight tiers are overrepresented in the top-k; repeat runs identical") {
    val d = "/root/testdata/sf0.01" // 500 docs, 200 sampled
    val run = SparkEntryAccess.query("q_weighted_sample")(spark, d)
    val rows = run.collect()
    assert(rows.length == 200)
    val sampledByW = rows.groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    val corpusByW = Tables.documents(spark, d)
      .selectExpr("CASE CAST(substring(source, 4, 10) AS INT) % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS w")
      .groupBy("w").count().collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    def rate(w: Long) = sampledByW.getOrElse(w, 0).toDouble / corpusByW(w)
    assert(rate(4) > rate(2) && rate(2) > rate(1),
      s"inclusion rates must order by weight: ${Seq(1L, 2L, 4L).map(w => w -> rate(w))}")
    // deterministic: a second evaluation returns the identical sample
    val again = SparkEntryAccess.query("q_weighted_sample")(spark, d).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}

/** Test-side accessor (SparkEntry lives in the parent package). */
private object SparkEntryAccess {
  def query(name: String): (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
    graft.SparkEntry.queries(name)
}
