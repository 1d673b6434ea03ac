package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data SELECTION operators — the "which docs do we keep"
  * layer of an LLM curation pipeline, on top of the quality/dedup
  * batteries:
  *
  *  - DSIR-style importance weights (Xie et al. 2023, "Data Selection
  *    for Language Models via Importance Resampling"): score every raw
  *    doc by how target-like its hashed n-gram feature distribution is,
  *    as the log-likelihood ratio of two smoothed bag-of-buckets models.
  *  - Bloom-prefiltered exact decontamination: the q_contamination
  *    semantics with the benchmark gram set applied as a codegen'd
  *    bloom AT THE SCAN, so at 100 TB the candidate gram stream pays
  *    the exchange only for (hits ∪ ε false positives) — the exact
  *    join then clears the FPs, which is why the SAME DuckDB oracle
  *    certifies both formulations.
  *  - A fastText-shaped hashed linear quality classifier (the CCNet /
  *    LLaMA-pipeline filter form): margin = mean over hashed features
  *    of a weight vector. Weights here are deterministic dyadic md5
  *    uniforms so the oracle can re-derive them bit-exactly; swapping
  *    in trained weights changes one column, not the plan.
  *
  * All three are oracle-checked (hash match vs DuckDB at sf0.01).
  * Float discipline: ln() per bucket rounded to 6 dp before the
  * per-doc sum (q_bm25 precedent); classifier weights are dyadic
  * rationals (52-bit md5 prefix / 2^52 — EXACT in both engines); no
  * exp/sigmoid in the parity surface (monotone, so the selection label
  * is unchanged); ranks are taken on ROUNDED values with a doc_id
  * tie-break, never on raw float sums.
  */
object DataSelectOps {

  private val B = 4096 // hashed-feature buckets (DSIR + classifier)

  /** Hashed n-gram bucket in [0, B): 48-bit md5 prefix, exact in both
    * engines (DuckDB: CAST('0x'||substr(md5(f),1,12) AS BIGINT) % B).
    */
  private def bucket(feat: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(feat), 1, 12), 16, 10).cast(LongType), lit(B.toLong))

  val all: Seq[QueryDef] = Seq(

    // DSIR importance weights: features = word unigrams + bigrams,
    // hashed into B buckets; target corpus = the doc_id % 97 == 0
    // stand-in (same split q_contamination uses), raw = the rest.
    // log-importance(doc) = Σ_feat ln p̂(bucket) − ln q̂(bucket), add-one
    // smoothed. Shuffle shape at 100 TB: one explode→hash-agg to B
    // buckets (tiny), bucket model broadcast back onto the feature
    // stream, one hash-agg on doc_id — the corpus never shuffles on a
    // gram key. The global selected-rank runs on the per-DOC aggregate,
    // the same cost class as the oracle-mandated total ORDER BY; a
    // production selector would threshold on a sampled quantile of the
    // weight instead of ranking.
    QueryDef(
      "q_dsir_weights",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |feats AS (
         |  SELECT doc_id, unnest(t) AS feat FROM t
         |  UNION ALL
         |  SELECT doc_id,
         |    unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, greatest(len(t) - 1, 0) + 1)]) AS feat
         |  FROM t WHERE len(t) >= 2),
         |fb AS (
         |  SELECT doc_id, doc_id % 97 = 0 AS is_target,
         |    CAST('0x' || substr(md5(feat), 1, 12) AS BIGINT) % $B AS bucket
         |  FROM feats),
         |b AS (
         |  SELECT bucket,
         |    CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         |    CAST(sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END) AS BIGINT) AS cq
         |  FROM fb GROUP BY bucket),
         |tot AS (SELECT sum(cp) AS np, sum(cq) AS nq FROM b),
         |r AS (
         |  SELECT bucket,
         |    round(ln((cp + 1.0) / (np + $B.0)) - ln((cq + 1.0) / (nq + $B.0)), 6) AS lr
         |  FROM b, tot),
         |dw AS (
         |  SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    round(sum(r.lr), 6) AS log_importance
         |  FROM fb f JOIN r USING (bucket) WHERE NOT f.is_target
         |  GROUP BY f.doc_id)
         |SELECT doc_id, n_feats, log_importance,
         |  row_number() OVER (ORDER BY log_importance DESC, doc_id) <= 100 AS selected
         |FROM dw ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
      val uni = docs.select(col("doc_id"), explode(col("t")).as("feat"))
      val bi = Tables.documents(s, d).filter(size(split(col("text"), " ")) >= 2)
        .select(col("doc_id"), explode(DedupOps.shingles(col("text"), 2)).as("feat"))
      val fb = uni.unionByName(bi)
        .select(
          col("doc_id"), (col("doc_id") % 97 === 0).as("is_target"),
          bucket(col("feat")).as("bucket"))
      val b = fb.groupBy("bucket").agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("cq"))
      val tot = b.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))
      val r = b.crossJoin(broadcast(tot)) // single-row totals, map-side
        .select(
          col("bucket"),
          round(
            log((col("cp") + lit(1.0)) / (col("np") + lit(B.toDouble))) -
              log((col("cq") + lit(1.0)) / (col("nq") + lit(B.toDouble))), 6).as("lr"))
      val dw = fb.filter(!col("is_target"))
        .join(broadcast(r), Seq("bucket")) // bucket model: ≤ B rows
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_feats"),
          round(sum(col("lr")), 6).as("log_importance"))
      dw.withColumn(
        "selected",
        row_number().over(
          Window.orderBy(col("log_importance").desc, col("doc_id"))) <= 100)
        .orderBy("doc_id")
    },

    // Bloom-prefiltered exact decontamination — IDENTICAL result (and
    // oracle SQL) to q_contamination: the bloom is a superset filter and
    // the exact gram join clears its false positives. What changes is
    // the 100 TB shape: the candidate gram stream is pruned by a
    // codegen'd might_contain BEFORE any exchange, so the join pays
    // only for real overlaps — the decontamination pass a training
    // pipeline runs per benchmark refresh.
    QueryDef(
      "q_contamination_bloom",
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct([array_to_string(toks[i:i+4], ' ') FOR i IN range(1, greatest(len(toks) - 4, 0) + 1)]) AS grams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 5),
        |bench AS (
        |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
        |cand AS (
        |  SELECT doc_id, unnest(grams) AS gram, len(grams) AS n_grams
        |  FROM g WHERE doc_id % 97 <> 0)
        |SELECT c.doc_id,
        |  CAST(any_value(c.n_grams) AS BIGINT) AS n_grams,
        |  CAST(count(b.gram) AS BIGINT) AS n_contaminated,
        |  round(CAST(count(b.gram) AS DOUBLE) / any_value(c.n_grams), 6) AS contamination
        |FROM cand c LEFT JOIN bench b ON c.gram = b.gram
        |GROUP BY c.doc_id
        |ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val g = Tables.documents(s, d)
        .filter(size(split(col("text"), " ")) >= 5)
        .select(col("doc_id"), array_distinct(DedupOps.shingles(col("text"), 5)).as("grams"))
      val bench = g.filter(col("doc_id") % 97 === 0)
        .select(explode(col("grams")).as("gram")).distinct()
      val cand = g.filter(col("doc_id") % 97 =!= 0)
      val perDoc = cand.select(col("doc_id"), size(col("grams")).cast(LongType).as("n_grams"))
      val nBench = math.max(bench.count(), 1L) // tiny side sized honestly, as q_bloom_join
      val hits = BloomOps.bloomPrefilteredJoin(
        cand.select(col("doc_id"), explode(col("grams")).as("gram")),
        bench.withColumnRenamed("gram", "bgram"),
        col("gram"), col("bgram"), expectedDimKeys = nBench)
        .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
      perDoc.join(hits, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("n_grams"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          round(
            coalesce(col("n_contaminated"), lit(0L)).cast(DoubleType) / col("n_grams"),
            6).as("contamination"))
        .orderBy("doc_id")
    },

    // Hashed linear quality classifier (fastText/CCNet filter shape):
    // margin(doc) = mean over hashed unigram features of w[bucket].
    // Deterministic stand-in weights: dyadic md5 uniforms in [-1, 1)
    // (52-bit prefix / 2^52 — EXACT dyadic rationals in both engines,
    // zero float-parity risk; a trained model replaces ONE column).
    // label = rounded margin > 0. Same broadcast-model shape as DSIR:
    // the corpus shuffles once, on doc_id.
    QueryDef(
      "q_quality_classifier",
      s"""WITH f AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS feat FROM documents),
         |fb AS (
         |  SELECT doc_id, CAST('0x' || substr(md5(feat), 1, 12) AS BIGINT) % $B AS bucket FROM f),
         |w AS (
         |  SELECT DISTINCT bucket,
         |    CAST('0x' || substr(md5('w' || bucket), 1, 13) AS BIGINT) AS wk
         |  FROM fb),
         |m AS (
         |  SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(w.wk) AS BIGINT) AS swk
         |  FROM fb JOIN w USING (bucket) GROUP BY fb.doc_id)
         |SELECT doc_id, n_feats,
         |  round(2.0 * swk / (4503599627370496.0 * n_feats) - 1.0, 6) AS margin,
         |  round(2.0 * swk / (4503599627370496.0 * n_feats) - 1.0, 6) > 0 AS keep
         |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      val fb = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("feat"))
        .select(col("doc_id"), bucket(col("feat")).as("bucket"))
      // weights stay EXACT 52-bit integers through the sum; the one
      // float expression at the end is multiply/divide/subtract only —
      // each IEEE-correctly-rounded on identical operands in both
      // engines, so the hash can't drift (rounded-double weights summed
      // per group flipped a 6th-dp boundary — order-dependent error)
      val w = fb.select(col("bucket")).distinct()
        .select(
          col("bucket"),
          conv(substring(md5(concat(lit("w"), col("bucket"))), 1, 13), 16, 10)
            .cast(LongType).as("wk"))
      val margin =
        round(
          lit(2.0) * col("swk") / (lit(4503599627370496.0) * col("n_feats")) - lit(1.0), 6)
      fb.join(broadcast(w), Seq("bucket")) // model: ≤ B rows
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_feats"), sum(col("wk")).as("swk"))
        .select(
          col("doc_id"), col("n_feats"), margin.as("margin"), (margin > 0).as("keep"))
        .orderBy("doc_id")
    })
}
