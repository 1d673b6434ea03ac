package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Runtime-filter join and sketch contracts: the bloom prefilter is
  * semantics-free (oracle already proves it at sf0.01 — here on a
  * planted case with verified false positives), sits BEFORE the join in
  * the plan, and the count-min estimate keeps its one-sided bound.
  */
class BloomOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom prefilter passes a superset of joining rows; the join restores exactness") {
    val fact = (1L to 10000L).map(k => (k, k % 7)).toDF("fk", "payload")
    val dim = (1L to 10000L by 100).map(k => (k, s"d$k")).toDF("dk", "name")
    val bloom = BloomOps.buildBloom(dim, col("dk"), expectedItems = 100).get
    val pre = fact.filter(BloomOps.mightContain(bloom, col("fk")))
    val nPre = pre.count()
    assert(nPre >= 100, "every truly-joining row must survive (no false negatives)")
    assert(nPre < 10000, "the prefilter must actually drop non-joining rows")
    val joined = BloomOps.bloomPrefilteredJoin(
      fact, dim, col("fk"), col("dk"), expectedDimKeys = 100)
    val plain = fact.join(dim, col("fk") === col("dk"))
    assert(joined.count() == 100)
    assert(
      joined.select("fk").collect().map(_.getLong(0)).sorted.toSeq ==
        plain.select("fk").collect().map(_.getLong(0)).sorted.toSeq,
      "bloom-prefiltered join ≡ plain join")
  }

  test("empty build side short-circuits to an empty result") {
    val fact = (1L to 100L).toDF("fk")
    val dim = Seq.empty[Long].toDF("dk")
    val joined = BloomOps.bloomPrefilteredJoin(fact, dim, col("fk"), col("dk"), 1)
    assert(joined.count() == 0)
  }

  test("plan shape: might_contain filters the fact scan BEFORE the join") {
    val p = graft.SparkEntry.queries("q_bloom_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"bloom probe missing from the plan:\n$p")
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = math.max(p.indexOf("Join"), p.indexOf("join ["))
    assert(joinIdx >= 0, s"no join in plan:\n$p")
    assert(probeIdx > joinIdx,
      "the probe must appear BELOW the join operator (filters before joining) " +
        s"in the plan tree:\n$p")
  }

  test("count-min estimates are one-sided: est >= exact, within the eps bound") {
    // probe the sketch directly for the NUMERIC one-sided bound (the
    // query now emits the verdict booleans the oracle checks)
    import graft.ops.Tables
    val ev = Tables.events(spark, sf)
    val cms = ev.stat.countMinSketch(col("event_type"), eps = 0.001, confidence = 0.99,
      seed = 42)
    val rows = ev.groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    rows.foreach { case (k, exact) =>
      val est = cms.estimateCount(k)
      assert(est >= exact, s"CMS must never underestimate: $k est=$est exact=$exact")
      assert(est <= exact + math.max(1L, (0.001 * 2 * total).toLong),
        s"overestimate beyond eps bound: $k est=$est exact=$exact total=$total")
    }
    // and the query-surface verdicts agree
    val verdicts = graft.SparkEntry.queries("q_cms_freq")(spark, sf)
      .collect().map(r => (r.getString(0), r.getBoolean(2), r.getBoolean(3)))
    assert(verdicts.nonEmpty && verdicts.forall { case (_, a, b) => a && b },
      verdicts.mkString(", "))
  }
}
