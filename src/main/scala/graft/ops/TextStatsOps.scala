package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-statistics screens: Zipf rank-frequency fit and per-source
  * lexical diversity — the cheap whole-corpus health checks run before
  * and after every major curation step (a corpus whose Zipf slope
  * drifts far from −1, or whose hapax mass collapses, has been
  * over-deduplicated or is template spam).
  *
  * Scale: both are token-shuffle aggregates over one scan; the Zipf
  * rank window runs over the VOCABULARY (thousands of rows after the
  * count agg), never the corpus — the single-partition window on a
  * vocab-sized frame is the documented exception to the no-global-
  * window rule (same as q_tpch_q15's supplier rank).
  */
object TextStatsOps {

  val all: Seq[QueryDef] = Seq(

    // OLS slope/intercept of ln(freq) on ln(rank) over the token
    // frequency table — Zipf's law predicts slope ≈ -1 on natural text.
    // Ties in frequency get deterministic ranks via the token tiebreak.
    QueryDef(
      "q_zipf_slope",
      """WITH f AS (
        |  SELECT tok, CAST(count(*) AS DOUBLE) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |r AS (
        |  SELECT freq, CAST(row_number() OVER (ORDER BY freq DESC, tok) AS DOUBLE) AS rank
        |  FROM f)
        |SELECT round(regr_slope(ln(freq), ln(rank)), 6) AS slope,
        |  round(regr_intercept(ln(freq), ln(rank)), 6) AS intercept,
        |  CAST(count(*) AS BIGINT) AS vocab
        |FROM r""".stripMargin) { (s, d) =>
      val f = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).cast(DoubleType).as("freq"))
      val r = f.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))).cast(DoubleType))
      r.agg(
        round(regr_slope(log(col("freq")), log(col("rank"))), 6).as("slope"),
        round(regr_intercept(log(col("freq")), log(col("rank"))), 6).as("intercept"),
        count(lit(1)).as("vocab"))
    },

    // Asymmetric containment |A∩B|/|A| alongside Jaccard over the same
    // neighbor pairs as q_ngram_jaccard: containment is the measure
    // that catches QUOTES and subsets — a short doc fully embedded in a
    // long one scores containment ≈ 1 while Jaccard stays near
    // |A|/|B| ≈ 0 (Broder's two resemblance measures; dedup pipelines
    // screen on both).
    QueryDef(
      "q_ngram_containment",
      """WITH sh AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |    list_distinct([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)]) AS grams
        |  FROM (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 3),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.grams AS ga, b.grams AS gb
        |  FROM sh a JOIN sh b ON a.source = b.source AND b.rn = a.rn + 1)
        |SELECT doc_a, doc_b,
        |  round(CAST(len(list_intersect(ga, gb)) AS DOUBLE) / len(ga), 6) AS cont_a_in_b,
        |  round(CAST(len(list_intersect(ga, gb)) AS DOUBLE) / len(gb), 6) AS cont_b_in_a,
        |  round(CAST(len(list_intersect(ga, gb)) AS DOUBLE)
        |        / len(list_distinct(list_concat(ga, gb))), 6) AS jaccard
        |FROM pairs ORDER BY doc_a""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wSrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val sh = Tables.documents(s, d)
        .filter(size(split(col("text"), " ")) >= 3)
        .select(
          col("doc_id"), col("source"),
          row_number().over(wSrc).as("rn"),
          array_distinct(DedupOps.shingles(col("text"), 3)).as("grams"))
      val aa = sh.select(col("doc_id").as("doc_a"), col("source"), col("rn"), col("grams").as("ga"))
      val bb = sh.select(
        col("doc_id").as("doc_b"), col("source").as("source_b"),
        col("rn").as("rn_b"), col("grams").as("gb"))
      val inter = size(array_intersect(col("ga"), col("gb"))).cast(DoubleType)
      aa.join(bb, col("source") === col("source_b") && col("rn_b") === col("rn") + 1)
        .select(
          col("doc_a"), col("doc_b"),
          round(inter / size(col("ga")), 6).as("cont_a_in_b"),
          round(inter / size(col("gb")), 6).as("cont_b_in_a"),
          round(inter / size(array_union(col("ga"), col("gb"))), 6).as("jaccard"))
        .orderBy("doc_a")
    },

    // Domain drift: KL(P_source || P_corpus) over unigram distributions
    // — how far each source's language deviates from the pooled corpus
    // (the mixing-weight diagnostic next to q_domain_mix). No smoothing
    // needed: the corpus distribution is a superset of every source's
    // support, so p_corpus(t) > 0 wherever p_source(t) > 0.
    QueryDef(
      "q_domain_kl",
      """WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |sc AS (SELECT source, tok, CAST(count(*) AS DOUBLE) AS c FROM t GROUP BY 1, 2),
        |st AS (SELECT source, sum(c) AS n FROM sc GROUP BY source),
        |cc AS (SELECT tok, sum(c) AS cn FROM sc GROUP BY tok),
        |ct AS (SELECT sum(cn) AS n FROM cc)
        |SELECT sc.source,
        |  round(sum((sc.c / st.n) * ln((sc.c / st.n) / (cc.cn / (SELECT n FROM ct)))), 6) AS kl
        |FROM sc JOIN st ON sc.source = st.source JOIN cc ON sc.tok = cc.tok
        |GROUP BY sc.source ORDER BY sc.source""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val sc = t.groupBy("source", "tok").agg(count(lit(1)).cast(DoubleType).as("c"))
      val st = sc.groupBy("source").agg(sum(col("c")).as("n"))
      val cc = sc.groupBy("tok").agg(sum(col("c")).as("cn"))
      // corpus total rides the plan as a broadcast 1-row frame — an
      // eager head() here would run the tokenize+aggregate pipeline a
      // second time just to bake a literal in
      val total = cc.agg(sum(col("cn")).as("tot"))
      val ps = col("c") / col("n")
      sc.join(st, "source")
        .join(cc, "tok") // vocab-sized: AQE broadcasts when it fits
        .crossJoin(broadcast(total))
        .groupBy("source")
        .agg(round(sum(ps * log(ps / (col("cn") / col("tot")))), 6).as("kl"))
        .orderBy("source")
    },

    // Robust outlier screen: median/MAD z-scores per event type — the
    // screen that survives the contamination it is looking for (one
    // extreme value drags a mean/stddev z-score's own baseline; the
    // median and MAD move by at most one order statistic). Median =
    // exact interpolated percentile on BOTH engines (linear
    // interpolation of the same two order statistics — correctly-
    // rounded arithmetic on identical values, so the threshold cannot
    // flip).
    QueryDef(
      "q_mad_outlier",
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, e.event_id, e.value, m.med,
        |    abs(e.value - m.med) AS adev
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_id, d.event_type, d.value,
        |  round((d.value - d.med) / (1.4826 * x.mad), 6) AS robust_z
        |FROM dev d JOIN mad x ON d.event_type = x.event_type
        |WHERE x.mad > 0 AND abs((d.value - d.med) / (1.4826 * x.mad)) > 1.2
        |ORDER BY d.event_type, d.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5D)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type").as("et2"))
        .agg(expr("percentile(adev, 0.5D)").as("mad"))
        .filter(col("mad") > 0)
      val z = (col("value") - col("med")) / (lit(1.4826) * col("mad"))
      dev.join(broadcast(mad), col("event_type") === col("et2"))
        .filter(abs(z) > 1.2)
        .select(col("event_id"), col("event_type"), col("value"),
          round(z, 6).as("robust_z"))
        .orderBy("event_type", "event_id")
    },

    // Gini coefficient of the token-frequency distribution — corpus
    // concentration in one number (0 = uniform usage, →1 = a few tokens
    // dominate). Rank window over the VOCABULARY (the q_tpch_q15 /
    // q_zipf_slope single-partition exception: thousands of rows after
    // the count agg, never the corpus).
    QueryDef(
      "q_token_gini",
      """WITH f AS (
        |  SELECT tok, CAST(count(*) AS DOUBLE) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |r AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY c, tok) AS DOUBLE) AS i,
        |    CAST(count(*) OVER () AS DOUBLE) AS n
        |  FROM f)
        |SELECT round(2.0 * sum(i * c) / (max(n) * sum(c)) - (max(n) + 1) / max(n), 6) AS gini,
        |  CAST(max(n) AS BIGINT) AS vocab
        |FROM r""".stripMargin) { (s, d) =>
      val f = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).cast(DoubleType).as("c"))
      val r = f
        .withColumn("i", row_number().over(Window.orderBy(col("c"), col("tok"))).cast(DoubleType))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()).cast(DoubleType))
      r.agg(
        round(lit(2.0) * sum(col("i") * col("c")) / (max(col("n")) * sum(col("c")))
          - (max(col("n")) + 1) / max(col("n")), 6).as("gini"),
        max(col("n")).cast(LongType).as("vocab"))
    },

    // Per-source lexical diversity: type-token ratio and hapax (freq=1
    // within the source) fraction of the vocabulary.
    QueryDef(
      "q_lexical_diversity",
      """WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        |f AS (
        |  SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok)
        |SELECT source,
        |  CAST(sum(c) AS BIGINT) AS tokens,
        |  CAST(count(*) AS BIGINT) AS types,
        |  round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
        |  round(sum(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END) / count(*), 6) AS hapax_frac
        |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(
          sum(col("c")).as("tokens"),
          count(lit(1)).as("types"),
          round(count(lit(1)).cast(DoubleType) / sum(col("c")), 6).as("ttr"),
          round(sum(when(col("c") === 1, 1.0).otherwise(0.0)) / count(lit(1)), 6).as("hapax_frac"))
        .select(
          col("source"), col("tokens"), col("types"), col("ttr"), col("hapax_frac"))
        .orderBy("source")
    })
}
