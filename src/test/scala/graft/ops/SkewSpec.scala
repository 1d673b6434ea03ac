package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Skew-hardened rank selection: semantics identical to the plain
  * window on a planted hot key, and the physical plan actually spreads
  * the hot key (salt in the phase-1 partitioning / partial min_by
  * before the exchange).
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // planted skew: one user owns ~91% of all rows
  private lazy val hot = {
    val hotRows = (0 until 20000).map(i => (1L, 1000L + i, s"e$i", i.toDouble))
    val rest = for (u <- 2 to 100; i <- 0 until 20)
      yield (u.toLong, 100000L + u * 100 + i, s"e$i", i.toDouble)
    (hotRows ++ rest).toDF("user_id", "ts", "event_id", "value")
  }

  private def plainTopK(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    hot.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet

  test("salted two-phase top-1 and top-3 equal the plain window on a 91%-hot key") {
    for (k <- Seq(1, 3)) {
      val salted = SkewOps.topKPerKeySalted(
        hot, Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc), k, salts = 8)
      assert(asSet(salted) == asSet(plainTopK(k)), s"k=$k mismatch")
    }
  }

  test("argMaxPerKey equals the plain window top-1; argMinPerKey picks the first writer") {
    val mx = SkewOps.argMaxPerKey(hot, Seq(col("user_id")), Seq(col("ts"), col("event_id")))
    assert(asSet(mx) == asSet(plainTopK(1)))
    val mn = SkewOps.argMinPerKey(hot, Seq(col("user_id")), Seq(col("ts"), col("event_id")))
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val plainFirst = hot.withColumn("rn", row_number().over(wAsc)).filter(col("rn") === 1).drop("rn")
    assert(asSet(mn) == asSet(plainFirst))
  }

  test("plan shape: phase-1 window partitions on (key, salt); agg path pre-reduces map-side") {
    val salted = SkewOps.topKPerKeySalted(
      hot, Seq(col("user_id")), Seq(col("ts").desc), 1, salts = 8)
    val saltedPlan = salted.queryExecution.executedPlan.toString
    assert(saltedPlan.contains("_salt"),
      "phase-1 exchange/sort must include the salt column — without it the hot key is one task again")

    val agg = SkewOps.argMinPerKey(hot, Seq(col("user_id")), Seq(col("ts")))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("partial_min_by") || aggPlan.contains("partial min_by"),
      s"min_by must partial-aggregate before the shuffle, got:\n$aggPlan")
  }

  test("helper-column collisions: input columns named _salt/_rn1/_w survive intact") {
    // withColumn silently replaces same-named columns — the helpers must
    // pick fresh names instead of corrupting/dropping the user's data
    val withClash = hot
      .withColumn("_salt", lit("mine"))
      .withColumn("_rn1", lit(7))
    val top = SkewOps.topKPerKeySalted(
      withClash, Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc), 1, salts = 4)
    assert(top.columns.toSet == withClash.columns.toSet,
      s"user columns must survive, got ${top.columns.mkString(",")}")
    assert(top.select("_salt").distinct().collect().map(_.getString(0)).toSeq == Seq("mine"))
    assert(asSet(top) == asSet(plainTopK(1)), "results unchanged by the clashing columns")

    val withW = hot.withColumn("_w", lit(1))
    val mn = SkewOps.argMinPerKey(withW, Seq(col("user_id")), Seq(col("ts"), col("event_id")))
    assert(mn.columns.toSet == withW.columns.toSet)
    assert(mn.filter(col("_w") =!= 1).count() == 0)
  }

  test("no single-task straggler: the hot key's phase-1 work lands in multiple salt groups") {
    // count distinct salt buckets actually used for the hot key — each is
    // an independently schedulable unit of phase-1 work
    val salts = 8
    val buckets = hot.filter(col("user_id") === 1L)
      .withColumn("_salt", pmod(xxhash64(hot.columns.map(col): _*), lit(salts)))
      .select("_salt").distinct().count()
    assert(buckets == salts, s"hot key spread over $buckets/$salts salt buckets")
  }
}
