package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Runtime-filter machinery for joins whose build side is too big to
  * broadcast as ROWS but whose KEY SET fits a bloom filter — the regime
  * between a broadcast join and a full shuffle join, and the single
  * biggest shuffle saver on a 100 TB fact table (Spark's own AQE
  * injects the same shape when `runtime.bloomFilter.enabled` is on; this
  * is the explicit, composable form).
  *
  * Shape: ONE distributed pass over the build side folds its keys into a
  * bloom (BloomFilterAggregate — partial blooms merge map-side, only the
  * filter bytes reach the driver); the probe side then drops non-joining
  * rows AT THE SCAN with a codegen'd `might_contain` predicate BEFORE
  * paying the exchange, so the shuffle carries only (joining ∪ ε
  * false-positive) rows. The real join still runs — bloom false
  * positives are eliminated there, which is why the result stays EXACT
  * and the whole rewrite is oracle-checkable against the plain join.
  *
  * Built on Spark's own sketch expressions (`BloomFilterAggregate`,
  * `BloomFilterMightContain` over xxhash64) via the ColumnBridge — both
  * codegen-friendly, no UDF in the hot path.
  */
object BloomOps {

  /** Fold `key` of every `dim` row into a bloom filter; returns the
    * serialized filter, or None when `dim` is empty (callers can then
    * short-circuit the probe side to nothing). `fpp` trades filter size
    * against wasted shuffle: 1% ≈ 9.6 bits/key.
    */
  def buildBloom(dim: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(dim.select(ColumnBridge.column(agg).as("bf")).head().getAs[Array[Byte]](0))
  }

  /** Codegen'd probe predicate: false ⇒ `key` is definitely not in the
    * build side; true ⇒ probably is (fpp false-positive rate).
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Two-regime key-set restriction: keep only `df` rows whose `dfKey`
    * (probably) appears in `keys` (a single-column frame). Few keys →
    * an `isin` literal list — EXACT, and Catalyst pushes the `In` to
    * the scan (BloomIndex file-skips it). Many keys → one distributed
    * bloom build + a codegen'd `might_contain` — a SUPERSET (fpp false
    * positives), so callers must still run their exact join/filter.
    * The regime probe is `limit(k+1)`, never a full count. Shared by
    * [[graft.streaming.StreamingEnrich.enrichBatch]] (stream batch →
    * huge static side) and
    * [[graft.pipeline.DedupIndex.prefilterIndex]] (increment buckets →
    * stored band table) so the regime thresholds and empty-set
    * semantics cannot drift apart.
    */
  def filterToKeySet(df: DataFrame, dfKey: Column, keys: DataFrame,
      maxInList: Int = 1024, fpp: Double = 0.01,
      keyRowBound: Long = -1L): DataFrame = {
    // the big regime evaluates `keys` three times (probe, sizing count,
    // bloom build) — persist so a derived key set (e.g. a per-batch
    // distinct in StreamingEnrich) computes once. Both regimes finish
    // their actions inside this call (isin literals / eager bloom
    // head()), so the cache can be dropped before returning. Spark
    // caching is NOT ref-counted: if the caller already persisted
    // `keys` for its own reuse, persisting/unpersisting here would
    // silently evict THEIR cache — so only manage the cache when the
    // frame arrives unpersisted.
    val ownCache = keys.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val cached = if (ownCache) keys.persist() else keys
    try {
      // `keyRowBound` >= 0 is a caller-known upper bound on keys' rows
      // (e.g. a just-counted pre-distinct frame): when it already
      // exceeds maxInList the limit-probe job is skipped and the big
      // regime is entered directly. Regime choice is a PERFORMANCE
      // decision only — both regimes are correct (the bloom is a
      // superset the caller's exact join clears) — so an over-estimate
      // (many key rows collapsing to few distincts) costs nothing but
      // the isin nicety.
      val probe =
        if (keyRowBound >= 0 && keyRowBound > maxInList) Array.empty[org.apache.spark.sql.Row]
        else cached.limit(maxInList + 1).collect()
      // a small claimed bound is VERIFIABLE against the probe just
      // collected — fail loudly on a lying bound instead of letting
      // bound=0 with nonempty keys fall through to filter(false)
      // below (which would silently drop every probe-side row; in the
      // dedup prefilter that admits every duplicate as novel)
      require(keyRowBound < 0 || keyRowBound > maxInList ||
          probe.length <= keyRowBound,
        s"keyRowBound=$keyRowBound is not an upper bound: the key frame " +
          s"holds >= ${probe.length} rows — fix the caller's arithmetic")
      if ((keyRowBound < 0 || keyRowBound <= maxInList) && probe.length <= maxInList) {
        if (probe.isEmpty) df.filter(lit(false))
        else df.filter(dfKey.isin(probe.map(_.get(0)).toSeq: _*))
      } else {
        // bloom sizing: the caller's bound serves when present — an
        // over-sized bloom only LOWERS the fpp (more bits for fewer
        // items; ~1.2 MB at a 1M bound), while the count job it
        // replaces is pure driver latency on increment-sized key sets.
        // An actually-empty key frame under a positive bound still
        // degrades safely: BloomFilterAggregate over zero rows returns
        // null → None → filter(false), same as the counted path.
        val n = if (keyRowBound >= 0) keyRowBound else cached.count()
        if (n == 0) df.filter(lit(false))
        else buildBloom(cached, col(cached.columns.head), n, fpp) match {
          case Some(bloom) => df.filter(mightContain(bloom, dfKey))
          case None => df.filter(lit(false))
        }
      }
    } finally if (ownCache) { cached.unpersist(); () }
  }

  /** The composed runtime-filter join: bloom-prefilter `fact`, then the
    * exact join. Result is IDENTICAL to `fact.join(dim, cond)` — the
    * join clears the bloom's false positives — but the fact-side shuffle
    * carries only rows that (probably) join.
    */
  def bloomPrefilteredJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column,
      expectedDimKeys: Long, fpp: Double = 0.01): DataFrame =
    buildBloom(dim, dimKey, expectedDimKeys, fpp) match {
      case None => fact.filter(lit(false)).join(dim, factKey === dimKey)
      case Some(bloom) => fact.filter(mightContain(bloom, factKey)).join(dim, factKey === dimKey)
    }

  val all: Seq[QueryDef] = Seq(

    // Revenue of lineitems belonging to high-value orders. The Spark
    // plan is the bloom-prefiltered join; the oracle is the PLAIN join —
    // hash equality proves the runtime filter is semantics-free.
    QueryDef(
      "q_bloom_join",
      """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 400000
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
      val hi = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val nKeys = math.max(hi.count(), 1L) // one count of the tiny dim sizes the bloom honestly
      bloomPrefilteredJoin(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        hi, col("l_orderkey"), col("o_orderkey"), expectedDimKeys = nKeys)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("revenue"))
        .orderBy("o_orderpriority")
    },

    // Count-min frequency estimates next to exact counts, per event
    // type — with the CM guarantees as verdict columns, which makes the
    // query hash-oracleable: DuckDB re-derives the exact counts and pins
    // both verdicts true (est >= exact always holds for CM; est <=
    // exact + eps·N holds w.p. 1−δ, deterministic here at fixed seed).
    // The raw estimate stays spec-pinned in BloomOpsSpec.
    // TRIAGE MARGIN: no_undercount is a hard CM invariant — false IS a
    // regression, always. bounded_overcount holds only w.p. 1−δ = 0.99
    // per key at eps = 0.001: deterministic at the fixed seed/SF today,
    // but a new SF, seed, or Spark CM-impl change can flip it without
    // any bug — compare est − exact against eps·N before escalating.
    QueryDef(
      "q_cms_freq",
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS exact,
        |  true AS no_undercount, true AS bounded_overcount
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val total = ev.count()
      val cms = ev.stat.countMinSketch(col("event_type"), eps = 0.001, confidence = 0.99,
        seed = 42)
      // the probe touches only the POST-AGGREGATION frame (one row per
      // event type) — the sketch build is the distributed pass; the
      // probe rides the plan as a codegen'd expression over the frozen
      // sketch bytes, so no closure UDF anywhere
      val bos = new java.io.ByteArrayOutputStream()
      cms.writeTo(bos)
      val estimate = graft.functions.HashFunctions.cms_estimate(_: Column, bos.toByteArray)
      ev.groupBy("event_type").agg(count(lit(1)).as("exact"))
        .withColumn("est", estimate(col("event_type")))
        .select(
          col("event_type"), col("exact"),
          (col("est") >= col("exact")).as("no_undercount"),
          (col("est") <= col("exact") + lit(0.001) * lit(total.toDouble)).as("bounded_overcount"))
        .orderBy("event_type")
    })
}
