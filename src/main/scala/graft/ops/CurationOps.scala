package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data curation operators — the filter/score/sample/quantize
  * stages a 100 TB corpus pipeline runs between raw ingest and training
  * (C4/Gopher-style heuristics per Raffel et al. '20 / Rae et al. '21):
  * rule-based quality filtering, benchmark-contamination detection,
  * deterministic stratified sampling, token-length histograms, and int8
  * embedding quantization. All per-row projections or single-shuffle
  * aggregations — nothing here exceeds one exchange — and every operator
  * is DuckDB-oracle-checked end to end.
  */
object CurationOps {

  // small English stopword set shared by both engines (literal in SQL)
  private[ops] val Stops =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with", "as", "at", "by")

  /** Quality metrics + keep decision as columns over a documents frame —
    * the reusable core of q_quality_filter, also consumed by the
    * composed q_curate_corpus pipeline.
    */
  def withQuality(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = split(col("text"), " ")
    val nWords = size(toks)
    val mwl = (length(col("text")) - (nWords - 1)).cast(DoubleType) / nWords
    val stopsArr = array(Stops.map(lit): _*)
    val swr = size(filter(toks, w => array_contains(stopsArr, w))).cast(DoubleType) / nWords
    val punct =
      col("text").endsWith(".") || col("text").endsWith("!") || col("text").endsWith("?")
    // punct_end is REPORTED but not part of keep: C4 applies the
    // punctuation rule per-LINE (ours would be per-doc), and the
    // synthetic driver corpus contains no sentence punctuation at all —
    // enforcing it keeps zero documents and makes every downstream
    // stage vacuous (measured: 0/500 docs end with . ! or ?)
    docs
      .withColumn("n_words", nWords.cast(LongType))
      .withColumn("mean_word_len", round(mwl, 6))
      .withColumn("stopword_ratio", round(swr, 6))
      .withColumn("punct_end", punct)
      .withColumn("keep",
        nWords >= 10 && nWords <= 5000 && mwl >= 2 && mwl <= 12 && swr >= 0.03)
  }

  val all: Seq[QueryDef] = Seq(

    // C4-style rule filter: word count bounds, mean word length band,
    // stopword-ratio floor; terminal punctuation is reported as a flag
    // but NOT enforced (see withQuality — the synthetic corpus has no
    // sentence punctuation, and C4's rule is per-line anyway). Flags
    // exposed per rule: a curation pipeline wants the WHY.
    QueryDef(
      "q_quality_filter",
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    len(string_split(text, ' ')) AS n_words,
         |    CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS mwl,
         |    CAST(len(list_filter(string_split(text, ' '),
         |      w -> list_contains([${Stops.map("'" + _ + "'").mkString(",")}], w))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS swr,
         |    text LIKE '%.' OR text LIKE '%!' OR text LIKE '%?' AS punct_end
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(n_words AS BIGINT) AS n_words,
         |  round(mwl, 6) AS mean_word_len,
         |  round(swr, 6) AS stopword_ratio,
         |  punct_end,
         |  n_words >= 10 AND n_words <= 5000
         |    AND mwl >= 2 AND mwl <= 12 AND swr >= 0.03 AS keep
         |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      withQuality(Tables.documents(s, d))
        .select("doc_id", "n_words", "mean_word_len", "stopword_ratio", "punct_end", "keep")
        .orderBy("doc_id")
    },

    // THE composed curation pipeline — what a corpus team actually runs:
    // quality filter -> MinHash near-dup groups over the SURVIVORS ->
    // canonical-only -> deterministic hash sample. Every stage is an
    // operator proven above; the composition itself is hash-verified
    // END TO END (DuckDB rebuilds the same chain, recursive-CTE
    // components included), so stage-wiring bugs — filtering after
    // dedup instead of before, sampling before canonicalization — can't
    // hide between green unit oracles.
    QueryDef(
      "q_curate_corpus",
      s"""WITH RECURSIVE q AS (
        |  SELECT doc_id, text,
        |    len(string_split(text, ' ')) AS n_words,
        |    CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS mwl,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> list_contains([${Stops.map("'" + _ + "'").mkString(",")}], w))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS swr
        |  FROM documents),
        |kept AS (
        |  SELECT doc_id, text, n_words FROM q
        |  WHERE n_words >= 10 AND n_words <= 5000
        |    AND mwl >= 2 AND mwl <= 12 AND swr >= 0.03),
        |${DedupOps.md5CcCtesSql("kept")},
        |canon AS (
        |  SELECT k.doc_id, k.text, k.n_words
        |  FROM kept k LEFT JOIN comps c ON c.id = k.doc_id
        |  WHERE coalesce(c.component, k.doc_id) = k.doc_id)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, md5(text) AS text_md5
        |FROM canon
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3','4','5','6','7')
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val kept = withQuality(Tables.documents(s, d))
        .filter(col("keep"))
        .select("doc_id", "text", "n_words")
      val groups = DedupOps.dedupGroupsMd5(kept.select("doc_id", "text"))
      kept
        .join(groups.filter(col("is_canonical")).select("doc_id"), Seq("doc_id"), "left_semi")
        .filter(substring(md5(col("doc_id").cast(StringType)), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
        .select(col("doc_id"), col("n_words"), md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    },

    // Benchmark-contamination check: fraction of each candidate doc's
    // distinct 5-gram shingles that collide with the "benchmark" gram
    // set (docs with doc_id % 97 == 0 stand in for an eval set). The
    // benchmark gram set is small and broadcast; candidates are scored
    // with one left join + one aggregation on doc_id — the fact side
    // never shuffles on the gram key.
    QueryDef(
      "q_contamination",
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
        .select(col("doc_id"), size(col("grams")).as("n_grams"), explode(col("grams")).as("gram"))
      cand.join(broadcast(bench.withColumn("hit", lit(1))), Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(
          first(col("n_grams")).cast(LongType).as("n_grams"),
          sum(coalesce(col("hit"), lit(0))).as("n_contaminated"))
        .select(
          col("doc_id"), col("n_grams"), col("n_contaminated"),
          round(col("n_contaminated").cast(DoubleType) / col("n_grams"), 6).as("contamination"))
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling: per-class keep rates via an
    // md5-hex threshold on the row key (the q_hash_sample idea, but the
    // cutoff depends on the stratum). view 1/2, click 1/4, others 1/16 —
    // hex-prefix cutoffs so both engines compare identical strings.
    QueryDef(
      "q_stratified_sample",
      """SELECT event_id, user_id, event_type
        |FROM events
        |WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 8) <
        |  CASE event_type WHEN 'view' THEN '80000000'
        |                  WHEN 'click' THEN '40000000'
        |                  ELSE '10000000' END
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .filter(substring(md5(col("event_id").cast(StringType)), 1, 8) <
          when(col("event_type") === "view", lit("80000000"))
            .when(col("event_type") === "click", lit("40000000"))
            .otherwise(lit("10000000")))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },

    // Token-count histogram: corpus length profile in 10-word buckets
    // (capped at bucket 10) with corpus share — the first chart anyone
    // draws over a training corpus. One shuffle (the groupBy); the share
    // is derived from the <=11 grouped rows themselves via an
    // unpartitioned window — no second scan of the table.
    QueryDef(
      "q_token_histogram",
      """WITH t AS (
        |  SELECT least(len(string_split(text, ' ')) // 10, 10) AS bucket FROM documents)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM t), 6) AS share
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(least(floor(size(split(col("text"), " ")) / 10), lit(10)).as("bucket"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      t.groupBy("bucket").agg(count(lit(1)).as("n_docs"))
        .select(
          col("bucket").cast(LongType).as("bucket"),
          col("n_docs"),
          round(col("n_docs").cast(DoubleType) / sum(col("n_docs")).over(w), 6).as("share"))
        .orderBy("bucket")
    },

    // Gopher-style repetition signals: duplicate-word and duplicate-
    // bigram fractions (Rae et al. '21 use dup-line/dup-ngram fractions
    // to kill boilerplate). Pure per-row array math — zero shuffles.
    QueryDef(
      "q_repetition",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (
        |  SELECT doc_id, toks,
        |    CASE WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
        |    END AS bigrams
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_words,
        |  round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS dup_word_frac,
        |  round(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams), 6) AS dup_bigram_frac
        |FROM g ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .filter(size(toks) >= 2)
        .select(col("doc_id"), toks.as("toks"), DedupOps.shingles(col("text"), 2).as("bigrams"))
        .select(
          col("doc_id"),
          size(col("toks")).cast(LongType).as("n_words"),
          round(lit(1.0) -
            size(array_distinct(col("toks"))).cast(DoubleType) / size(col("toks")), 6)
            .as("dup_word_frac"),
          round(lit(1.0) -
            size(array_distinct(col("bigrams"))).cast(DoubleType) / size(col("bigrams")), 6)
            .as("dup_bigram_frac"))
        .orderBy("doc_id")
    },

    // PII scrub: detect + redact emails/phones with identical regexes on
    // both engines. PII is PLANTED deterministically (docs carry none)
    // so the scrub is exercised on real matches, not vacuously green.
    QueryDef(
      "q_pii_scrub",
      """WITH t AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 7 = 0
        |      THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-0'
        |           || CAST(100 + doc_id % 900 AS VARCHAR) || ' now'
        |      ELSE '' END AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_matches(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}') AS has_email,
        |  regexp_matches(text2, '\+?[0-9][0-9()\-]{6,}[0-9]') AS has_phone,
        |  md5(regexp_replace(
        |    regexp_replace(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\-]{6,}[0-9]', '<PHONE>', 'g')) AS scrubbed_md5
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+?[0-9][0-9()\\-]{6,}[0-9]"
      val text2 = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast(StringType),
            lit("@example.com or +1-555-0"),
            (lit(100) + col("doc_id") % 900).cast(StringType), lit(" now")))
          .otherwise(lit("")))
      Tables.documents(s, d)
        .select(col("doc_id"), text2.as("text2"))
        .select(
          col("doc_id"),
          col("text2").rlike(emailRe).as("has_email"),
          col("text2").rlike(phoneRe).as("has_phone"),
          md5(regexp_replace(
            regexp_replace(col("text2"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>")).as("scrubbed_md5"))
        .orderBy("doc_id")
    },

    // Character-level Shannon entropy — the cheap perplexity proxy for
    // quality scoring (low entropy = repeated-char junk, high = random
    // bytes; natural text sits in a band). One explode + two aggs keyed
    // on doc_id.
    QueryDef(
      "q_char_entropy",
      """WITH c AS (
        |  SELECT doc_id, unnest([text[i] FOR i IN range(1, len(text) + 1)]) AS ch, len(text) AS n
        |  FROM documents WHERE len(text) > 0),
        |cnt AS (SELECT doc_id, ch, any_value(n) AS n, count(*) AS k FROM c GROUP BY doc_id, ch)
        |SELECT doc_id,
        |  round(-sum((CAST(k AS DOUBLE) / n) * log2(CAST(k AS DOUBLE) / n)), 6) AS char_entropy
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"), length(col("text")).as("n"))
        .groupBy(col("doc_id"), col("ch"))
        .agg(first(col("n")).as("n"), count(lit(1)).as("k"))
        .groupBy("doc_id")
        .agg(round(-sum((col("k").cast(DoubleType) / col("n")) *
          log2(col("k").cast(DoubleType) / col("n"))), 6).as("char_entropy"))
        .orderBy("doc_id")
    },

    // Corpus IDF — the TF-IDF building block: document frequency per
    // token with idf = ln(N/df), kept for df >= 5. One distinct-explode
    // + one shuffle on token; N is a scalar computed once.
    QueryDef(
      "q_idf",
      """WITH n AS (SELECT count(*) AS nd FROM documents),
        |tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, CAST(count(*) AS BIGINT) AS df,
        |  round(ln(CAST((SELECT nd FROM n) AS DOUBLE) / count(*)), 6) AS idf
        |FROM tok GROUP BY token HAVING count(*) >= 5 ORDER BY token""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val nDocs = docs.count()
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .distinct()
        .groupBy("token")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 5)
        .select(
          col("token"), col("df"),
          round(log(lit(nDocs.toDouble) / col("df")), 6).as("idf"))
        .orderBy("token")
    },

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf·idf — the per-doc summary a curation report samples. Shape:
    // one explode → groupBy(doc,term) for tf; df derived FROM the tf
    // frame (one row per (doc,term) already, so count(*) per term IS
    // document frequency — no second distinct-explode); tf ⋈ df on
    // term (vocab-sized build side, no broadcast hint — vocabulary is
    // heavy-tailed but fact-sized at production scale, AQE may
    // broadcast at test SFs); per-doc top-k window. Rank is taken on
    // the ROUNDED score with a term tie-break (q_tpch_q15 rule), and
    // the score multiplies the exact integer tf by the 6-dp-rounded
    // idf — one correctly-rounded multiply on identical operands.
    QueryDef(
      "q_tfidf_keywords",
      """WITH n AS (SELECT count(*) AS nd FROM documents),
        |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token HAVING count(*) >= 5),
        |sc AS (
        |  SELECT tf.doc_id, tf.token, tf.tf,
        |    round(tf.tf * round(ln(CAST((SELECT nd FROM n) AS DOUBLE) / df.df), 6), 6) AS tfidf
        |  FROM tf JOIN df USING (token)),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
        |  FROM sc)
        |SELECT doc_id, token, tf, tfidf, CAST(rk AS BIGINT) AS rank
        |FROM rk WHERE rk <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val nDocs = docs.count()
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df")).filter(col("df") >= 5)
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("token"))
      tf.join(df, Seq("token"))
        .select(
          col("doc_id"), col("token"), col("tf"),
          round(
            col("tf") * round(log(lit(nDocs.toDouble) / col("df")), 6), 6).as("tfidf"))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("tfidf"), col("rank"))
        .orderBy("doc_id", "rank")
    },

    // int8 scalar quantization of embeddings (the storage/serving
    // format for 100 TB-scale vector corpora): per-vector min/max range,
    // codes = floor((x-mn)/scale + 0.5) in [0,255], reconstruction RMSE.
    // Per-row arithmetic only — zero shuffles; the integer code checksum
    // is exact on both engines, RMSE compared at 6 dp.
    QueryDef(
      "q_embed_quantize",
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
        |r AS (
        |  SELECT vec_id, x, list_min(x) AS mn, list_max(x) AS mx,
        |    (list_max(x) - list_min(x)) / 255 AS scale
        |  FROM e),
        |q AS (
        |  SELECT vec_id, mn, mx, scale,
        |    CASE WHEN scale = 0 THEN list_transform(x, v -> CAST(0 AS BIGINT))
        |         ELSE list_transform(x, v -> CAST(floor((v - mn) / scale + 0.5) AS BIGINT)) END AS codes,
        |    x
        |  FROM r)
        |SELECT vec_id,
        |  round(mn, 6) AS vmin, round(mx, 6) AS vmax,
        |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
        |  round(sqrt(list_sum(list_transform(range(1, len(x) + 1),
        |    i -> pow(x[i] - (mn + codes[i] * scale), 2))) / len(x)), 6) AS rmse
        |FROM q ORDER BY vec_id""".stripMargin) { (s, d) =>
      val x = transform(col("embedding"), _.cast(DoubleType))
      val e = Tables.embeddings(s, d).select(col("vec_id"), x.as("x"))
        .withColumn("mn", array_min(col("x")))
        .withColumn("mx", array_max(col("x")))
        .withColumn("scale", (col("mx") - col("mn")) / 255)
        .withColumn("codes",
          when(col("scale") === 0, transform(col("x"), _ => lit(0L)))
            .otherwise(transform(col("x"),
              v => floor((v - col("mn")) / col("scale") + 0.5).cast(LongType))))
      e.select(
        col("vec_id"),
        round(col("mn"), 6).as("vmin"),
        round(col("mx"), 6).as("vmax"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
        round(sqrt(
          aggregate(
            zip_with(col("x"), col("codes"),
              (v, c) => pow(v - (col("mn") + c * col("scale")), 2)),
            lit(0.0), (acc, v) => acc + v) / size(col("x"))), 6).as("rmse"))
        .orderBy("vec_id")
    },

    // Gopher-style repetition filter (Rae et al. '21 §A1.1): character
    // fraction of the most frequent word n-gram (n=2..4) and duplicate
    // n-gram fraction 1 − distinct/total (n=2..4), one kernel pass per
    // row (RepetitionStatsExpr — codegen'd, zero shuffle; the oracle
    // re-derives the same stats relationally). Gopher's n≥5
    // duplicate-character rules are omitted: measured vacuous on this
    // corpus (all ≥5-grams unique). Thresholds are calibrated to the
    // measured sf0.01 quantiles so keep is a real split, not 0%/100%;
    // keep compares the ROUNDED stats so both engines decide ties
    // identically.
    QueryDef(
      "q_repetition_filter",
      """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |p2 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS s FROM toks WHERE len(t) >= 2),
        |g2 AS (SELECT doc_id, t[s] || ' ' || t[s+1] AS gram FROM p2),
        |c2 AS (SELECT doc_id, gram, count(*) cnt FROM g2 GROUP BY 1, 2),
        |t2 AS (SELECT doc_id, cnt, gram FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) rn FROM c2) WHERE rn = 1),
        |d2 AS (SELECT doc_id, 1.0 - count(DISTINCT gram) * 1.0 / count(*) AS dup FROM g2 GROUP BY 1),
        |p3 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS s FROM toks WHERE len(t) >= 3),
        |g3 AS (SELECT doc_id, t[s] || ' ' || t[s+1] || ' ' || t[s+2] AS gram FROM p3),
        |c3 AS (SELECT doc_id, gram, count(*) cnt FROM g3 GROUP BY 1, 2),
        |t3 AS (SELECT doc_id, cnt, gram FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) rn FROM c3) WHERE rn = 1),
        |d3 AS (SELECT doc_id, 1.0 - count(DISTINCT gram) * 1.0 / count(*) AS dup FROM g3 GROUP BY 1),
        |p4 AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-3)) AS s FROM toks WHERE len(t) >= 4),
        |g4 AS (SELECT doc_id, t[s] || ' ' || t[s+1] || ' ' || t[s+2] || ' ' || t[s+3] AS gram FROM p4),
        |c4 AS (SELECT doc_id, gram, count(*) cnt FROM g4 GROUP BY 1, 2),
        |t4 AS (SELECT doc_id, cnt, gram FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) rn FROM c4) WHERE rn = 1),
        |d4 AS (SELECT doc_id, 1.0 - count(DISTINCT gram) * 1.0 / count(*) AS dup FROM g4 GROUP BY 1),
        |j AS (
        |  SELECT x.doc_id,
        |    round(coalesce(t2.cnt * length(t2.gram) * 1.0 / length(x.text), 0), 6) AS top2_frac,
        |    round(coalesce(t3.cnt * length(t3.gram) * 1.0 / length(x.text), 0), 6) AS top3_frac,
        |    round(coalesce(t4.cnt * length(t4.gram) * 1.0 / length(x.text), 0), 6) AS top4_frac,
        |    round(coalesce(d2.dup, 0), 6) AS dup2_frac,
        |    round(coalesce(d3.dup, 0), 6) AS dup3_frac,
        |    round(coalesce(d4.dup, 0), 6) AS dup4_frac
        |  FROM toks x
        |  LEFT JOIN t2 USING (doc_id) LEFT JOIN d2 USING (doc_id)
        |  LEFT JOIN t3 USING (doc_id) LEFT JOIN d3 USING (doc_id)
        |  LEFT JOIN t4 USING (doc_id) LEFT JOIN d4 USING (doc_id))
        |SELECT *,
        |  (top2_frac < 0.10 AND top3_frac < 0.10 AND top4_frac < 0.12
        |    AND dup2_frac < 0.06) AS keep
        |FROM j ORDER BY doc_id""".stripMargin) { (s, d) =>
      val stats = graft.functions.HashFunctions.repetition_stats(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), stats.as("r"))
        .select(
          col("doc_id"),
          round(col("r.top2_frac"), 6).as("top2_frac"),
          round(col("r.top3_frac"), 6).as("top3_frac"),
          round(col("r.top4_frac"), 6).as("top4_frac"),
          round(col("r.dup2_frac"), 6).as("dup2_frac"),
          round(col("r.dup3_frac"), 6).as("dup3_frac"),
          round(col("r.dup4_frac"), 6).as("dup4_frac"))
        .withColumn("keep",
          col("top2_frac") < 0.10 && col("top3_frac") < 0.10 &&
            col("top4_frac") < 0.12 && col("dup2_frac") < 0.06)
        .orderBy("doc_id")
    })
}
