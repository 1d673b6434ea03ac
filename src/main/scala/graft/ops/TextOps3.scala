package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third text battery: collocation mining and the composed per-language
  * corpus report.
  *
  * Bigram generation is deliberately SHUFFLE-FREE until the final count:
  * adjacent pairs come from `arrays_zip(slice(toks,1,n-1), slice(toks,
  * 2,n-1))` inside the row — a codegen'd projection — instead of the
  * textbook posexplode + per-doc lead() window, whose Exchange on doc_id
  * ships every TOKEN of a 100 TB corpus across the network just to pair
  * neighbors that were already adjacent in the row. The only shuffle
  * left is the (w1, w2) count aggregation, which map-side partial
  * combine collapses to ~vocab² rows per partition.
  */
object TextOps3 {

  private val stopwords = Seq("the", "a", "of", "and")

  val all: Seq[QueryDef] = Seq(

    // Top-50 corpus bigrams. DuckDB oracle uses the lead()-window
    // formulation — same answer, different plan — so hash equality also
    // re-proves the zip rewrite against an independent derivation.
    QueryDef(
      "q_bigram_mine",
      """WITH t AS (
        |  SELECT doc_id, i, toks[i] AS tok, toks[i + 1] AS nxt
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |    unnest(range(1, len(toks))) AS u(i))
        |SELECT tok AS w1, nxt AS w2, CAST(count(*) AS BIGINT) AS n
        |FROM t
        |GROUP BY 1, 2
        |ORDER BY n DESC, w1, w2
        |LIMIT 50""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(explode(arrays_zip(
          slice(toks, lit(1), size(toks) - 1).as("w1"),
          slice(toks, lit(2), size(toks) - 1).as("w2"))).as("bg"))
        .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(50)
    },

    // Composed curation report: predicted language (the q_lang_id
    // stopword heuristic) crossed with the labeled language — a
    // confusion-matrix summary with per-cell quality stats, one
    // aggregation pass over the corpus.
    QueryDef(
      "q_corpus_by_lang",
      """SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  round(avg(n_tokens), 6) AS avg_tokens
        |FROM (
        |  SELECT lang, n_chars,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and'))) >= 3 THEN 'en'
        |         WHEN len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and'))) >= 1 THEN 'en_maybe'
        |         ELSE 'unk' END AS predicted
        |  FROM documents)
        |GROUP BY lang, predicted
        |ORDER BY lang, predicted""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      val hits = size(filter(toks, t => t.isin(stopwords: _*)))
      Tables.documents(s, d)
        .select(
          col("lang"), col("n_chars"),
          size(toks).as("n_tokens"),
          when(hits >= 3, "en").when(hits >= 1, "en_maybe").otherwise("unk").as("predicted"))
        .groupBy("lang", "predicted")
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("n_chars")), 6).as("avg_chars"),
          round(avg(col("n_tokens")), 6).as("avg_tokens"))
        .orderBy("lang", "predicted")
    })
}
