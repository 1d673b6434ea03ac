package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SpaceSaving sketch invariants — the exact regime (oracle's domain),
  * the approximate regime's error bounds, merge conservativeness, and
  * the Spark-level aggregation path.
  */
class HeavyHitterSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def countsOf(s: SpaceSaving): Map[String, (Long, Long)] = {
    val b = Map.newBuilder[String, (Long, Long)]
    s.counters.forEach((k, v) => b += k -> (v(0), v(1)))
    b.result()
  }

  test("exact while capacity is not exceeded: est = true count, err = 0") {
    val s = new SpaceSaving(8)
    val stream = Seq("a", "b", "a", "c", "a", "b", "d")
    stream.foreach(s.add(_))
    assert(countsOf(s) == Map("a" -> (3L, 0L), "b" -> (2L, 0L), "c" -> (1L, 0L), "d" -> (1L, 0L)))
    assert(s.minEst == 0L)
  }

  test("approximate regime: est >= true >= est - err, err <= N/capacity") {
    val cap = 8
    val s = new SpaceSaving(cap)
    // zipf-ish stream over 50 keys, 2000 items, deterministic
    val stream = (0 until 2000).map { i =>
      var x = i * 2654435761L % 997
      s"k${(x % (x % 49 + 1)).toInt}"
    }
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    stream.foreach(s.add(_))
    val n = stream.size.toLong
    countsOf(s).foreach { case (k, (est, err)) =>
      val t = truth(k)
      assert(est >= t, s"$k: est $est < true $t")
      assert(est - err <= t, s"$k: est-err ${est - err} > true $t")
      assert(err <= n / cap, s"$k: err $err > N/cap ${n / cap}")
    }
    // every key with true count > N/cap must be tracked (heavy-hitter guarantee)
    truth.filter(_._2 > n / cap).keys.foreach { k =>
      assert(s.counters.containsKey(k), s"heavy hitter $k lost")
    }
  }

  test("merge: conservative bounds hold across arbitrary splits; exact regime merges exactly") {
    val stream = (0 until 500).map(i => s"t${i % 23}")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // exact regime: capacity 32 > 23 distinct, any split merges exactly
    for (cut <- Seq(1, 100, 250, 499)) {
      val (l, r) = stream.splitAt(cut)
      val a = new SpaceSaving(32); l.foreach(a.add(_))
      val b = new SpaceSaving(32); r.foreach(b.add(_))
      val m = countsOf(a.merge(b))
      assert(m.view.mapValues(_._1).toMap == truth, s"cut=$cut")
      assert(m.values.forall(_._2 == 0L))
    }
    // approximate regime: bounds survive the merge
    val (l, r) = stream.splitAt(200)
    val a = new SpaceSaving(8); l.foreach(a.add(_))
    val b = new SpaceSaving(8); r.foreach(b.add(_))
    countsOf(a.merge(b)).foreach { case (k, (est, err)) =>
      assert(est >= truth(k) && est - err <= truth(k), s"$k bounds")
    }
  }

  test("TopKAgg: bounded buffers, deterministic ties, equals the window formulation") {
    val agg = new TopKAgg(3)
    // reduce never lets the buffer exceed 2k+1 before compaction
    var buf = agg.zero
    (0 until 100).foreach { i =>
      buf = agg.reduce(buf, (i % 7 * 1.0, i.toLong))
      assert(buf.length <= 7)
    }
    // max value 6.0 occurs at ids 6,13,20,…; merging the buffer with
    // itself duplicates entries, and ties resolve (value desc, id asc)
    val out = agg.finish(agg.merge(buf, buf)).items
    assert(out == Seq(TopKEntry(6.0, 6L), TopKEntry(6.0, 6L), TopKEntry(6.0, 13L)))

    // distributed path equals Spark's own window top-k on driver data
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = graft.SparkEntry.queries("q_topk_per_key")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val li = graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_returnflag").as("f"), col("l_extendedprice").cast("double").as("p"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("uid"))
    val w = Window.partitionBy(col("f")).orderBy(col("p").desc, col("uid").asc)
    val exact = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("f"), col("rn").cast("long"), round(col("p"), 6), col("uid"))
      .orderBy("f", "rn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == exact)
  }

  test("q_heavy_hitters: exact top-20 over the driver corpus, distributed path") {
    val out = graft.SparkEntry.queries("q_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_._3 == 0L), "capacity above vocab must stay exact")
    // agrees with Spark's own exact count
    import org.apache.spark.sql.functions._
    val exact = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .orderBy(desc("count"), asc("token")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.map(t => (t._1, t._2)).toSeq == exact.toSeq)
  }
}
