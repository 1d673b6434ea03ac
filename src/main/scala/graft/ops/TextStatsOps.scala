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
