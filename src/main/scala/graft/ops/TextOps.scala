package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting. All are pure codegen'd column
  * expressions (split/filter/transform HOFs + md5) — no UDFs, so the ops
  * scale linearly with input and stay inside whole-stage codegen.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and")

  /** DuckDB re-implementation of [[graft.functions.LangId.detect]] —
    * possible because the profiles are fixed literals and the score is
    * one exact integer division. Mirrors, in order: '_' normalization
    * of lowercased trimmed text; trigram windows (singleton [norm] under
    * 3 chars); per-language hit count over the gram LIST (dups counted)
    * except zh, which counts raw text chars; divide by gram count;
    * argmax by (score, lang) — ORDER BY score DESC, lang DESC matches
    * Scala's maxBy on the tuple; null/blank/zero-score → 'und'.
    */
  private def langIdNgramSql: String = {
    def lit(l: Seq[String]) = l.map(g => s"'$g'").mkString("[", ",", "]")
    import graft.functions.LangId.profiles
    val values = Seq("en", "es", "de", "fr", "zh")
      .map(l => s"('$l', ${lit(profiles(l).toSeq.sorted)})").mkString(",\n  ")
    s"""WITH prof(lang, grams) AS (VALUES
       |  $values),
       |norm AS (
       |  SELECT doc_id, text,
       |    '_' || regexp_replace(lower(trim(text)), '\\s+', '_', 'g') || '_' AS n
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, text,
       |    CASE WHEN length(n) < 3 THEN [n]
       |         ELSE [substring(n, CAST(i AS INT), 3) FOR i IN range(1, length(n) - 1)] END AS g
       |  FROM norm),
       |scored AS (
       |  SELECT g.doc_id, p.lang,
       |    CASE WHEN p.lang = 'zh'
       |      THEN len(list_filter([substring(g.text, CAST(i AS INT), 1) FOR i IN range(1, length(g.text) + 1)], c -> list_contains(p.grams, c)))
       |      ELSE len(list_filter(g.g, x -> list_contains(p.grams, x))) END
       |      / CAST(len(g.g) AS DOUBLE) AS score
       |  FROM grams g, prof p),
       |best AS (
       |  SELECT doc_id, lang, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
       |  FROM scored)
       |SELECT d.doc_id,
       |  CASE WHEN d.text IS NULL OR trim(d.text) = '' THEN 'und'
       |       WHEN b.score <= 0.0 THEN 'und'
       |       ELSE b.lang END AS lang_pred
       |FROM documents d JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
       |ORDER BY d.doc_id""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(

    // Token counting: whitespace tokens + distinct tokens.
    QueryDef(
      "q_token_count",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).cast(LongType).as("n_tokens"),
          size(array_distinct(toks)).cast(LongType).as("n_distinct_tokens"),
          length(col("text")).cast(LongType).as("n_chars"))
        .orderBy("doc_id")
    },

    // Quality scoring: stopword ratio + mean token length — the
    // length/stopword heuristics of C4/Gopher-style filters.
    QueryDef(
      "q_quality_score",
      s"""SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  round(CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
         |        / len(string_split(text, ' ')), 6) AS stop_ratio,
         |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
         |        / len(string_split(text, ' ')), 6) AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      val nToks = size(toks)
      val nStop = size(filter(toks, t => t.isin(stopwords: _*)))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nToks.cast(LongType).as("n_tokens"),
          round(nStop.cast(DoubleType) / nToks, 6).as("stop_ratio"),
          round(length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / nToks, 6)
            .as("avg_token_len"))
        .orderBy("doc_id")
    },

    // Language-ID heuristic: English function-word hit rate — the
    // oracle-checkable core. The real char-n-gram profile classifier is
    // graft.functions.LangId (+ LangIdExpr column form, q_lang_id_ngram),
    // ScalaTest-verified on multilingual samples.
    QueryDef(
      "q_lang_id",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and'))) AS BIGINT) AS en_hits,
        |  CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and'))) >= 3 THEN 'en'
        |       WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and'))) >= 1 THEN 'en_maybe'
        |       ELSE 'unk' END AS predicted
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val hits = size(filter(split(col("text"), " "), t => t.isin(stopwords: _*)))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          hits.cast(LongType).as("en_hits"),
          when(hits >= 3, "en").when(hits >= 1, "en_maybe").otherwise("unk").as("predicted"))
        .orderBy("doc_id")
    },

    // Char-n-gram language ID over documents (native LangIdExpr). The
    // classifier is a pure function of fixed literal profiles, so the
    // DuckDB twin re-implements it whole in SQL: trigram windows over
    // the '_'-normalized text, per-language hit rate (raw-char count for
    // zh), argmax with the (score, lang) tuple tie-break, 'und' floor.
    // Score equality is exact across engines (one integer division).
    QueryDef("q_lang_id_ngram", langIdNgramSql) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.LangIdFunctions.lang_id(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },

    // Rolling-hash fingerprinting (Karp-Rabin + winnowing-style window
    // min): whole-doc polynomial hash (native kernel, oracle-checked
    // against DuckDB's list_reduce) + min md5 over all 32-char windows —
    // the near-dup fingerprint robust to local edits.
    QueryDef(
      "q_rolling_fingerprint",
      """SELECT doc_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    [CAST(ascii(text[i]) AS BIGINT) FOR i IN range(1, len(text) + 1)]),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS poly_hash,
        |  CASE WHEN len(text) >= 32 THEN
        |    list_min([substr(md5(text[i:i+31]), 1, 16) FOR i IN range(1, len(text) - 31 + 1)])
        |  END AS winnow_min
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          graft.functions.HashFunctions.rolling_hash(col("text")).as("poly_hash"),
          // native kernel (WinnowMinExpr); null for texts under 32 chars,
          // matching the SQL CASE guard
          graft.functions.HashFunctions.winnow_min(col("text"), 32).as("winnow_min"))
        .orderBy("doc_id")
    },

    // Document fingerprint: md5 over whitespace-normalized lowercased text
    // — the exact-dup key used by content-defined dedup.
    QueryDef(
      "q_doc_fingerprint",
      """SELECT doc_id,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fingerprint"))
        .orderBy("doc_id")
    })
}
