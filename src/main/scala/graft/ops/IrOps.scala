package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lexical retrieval + statistical screening over `documents`/`events`:
  * BM25 scoring, sparse TF-IDF cosine similarity via an inverted-index
  * join, and z-score outlier screening — the lexical complement to the
  * embedding-based ANN stack (dense near-dup catches paraphrase; sparse
  * lexical cosine catches shared boilerplate with different embeddings).
  *
  * Scale shapes: BM25's per-term stats (df, idf) are a handful of rows
  * broadcast back against the posting lists; the sparse-cosine
  * inverted-index self-join shuffles on TOKEN and is quadratic in
  * posting-list length, so it needs BOTH standard controls: the max-df
  * cut for stop tokens (drop tokens present in most docs — inert here
  * only because this corpus's 31-token vocabulary would drop
  * everything) and deterministic BLOCKING for the degenerate
  * all-stop-token case (the md5 block in q_sparse_cosine — measured
  * 123 s → ~2 s at sf0.1; production sparse similarity is run exactly
  * this way, block-by-block, or through LSH candidates first).
  */
object IrOps {

  private val Bm25Terms = Seq("dup", "spark", "merge")
  private val K1 = 1.2
  private val B = 0.75
  private val RrfK = 60 // Cormack et al.'s standard RRF dampener

  /** The q_bm25 scoring chain as a reusable frame: (doc_id, score
    * rounded 6 dp) for docs matching ≥1 term. Single source for the
    * lexical leg of [[all]]'s q_bm25 and q_hybrid_rrf. */
  private def bm25Scores(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    // scalar corpus stats collected once, like the q_idf/q_scalar
    // precedent — two doubles, not data
    val Array(nd, avgdl) = docs
      .agg(count(lit(1)).cast(DoubleType), avg(size(split(col("text"), " "))))
      .head() match { case r => Array(r.getDouble(0), r.getDouble(1)) }
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(Bm25Terms: _*))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).cast(DoubleType).as("tf"))
    val idf = tf.groupBy("tok")
      .agg(log((lit(nd) - count(lit(1)) + 0.5) / (count(lit(1)) + 0.5) + 1).as("idf"))
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).cast(DoubleType).as("dl"))
    tf.join(broadcast(idf), "tok")
      .join(dl, "doc_id")
      .withColumn("part",
        col("idf") * col("tf") * lit(K1 + 1) /
          (col("tf") + lit(K1) * (lit(1) - lit(B) + lit(B) * col("dl") / lit(avgdl))))
      .groupBy("doc_id")
      .agg(round(sum(col("part")), 6).as("score"))
  }

  /** The q_bm25 oracle's CTE prefix (n/tf/idf/dl/bm), shared with the
    * hybrid query so the two lexical scorings can never drift. */
  private val bm25CtesSql: String =
    s"""n AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
       |  avg(len(string_split(text, ' '))) AS avgdl FROM documents),
       |tf AS (
       |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE tok IN ('dup', 'spark', 'merge') GROUP BY 1, 2),
       |idf AS (
       |  SELECT tok, ln(((SELECT nd FROM n) - count(*) + 0.5) / (count(*) + 0.5) + 1) AS idf
       |  FROM tf GROUP BY tok),
       |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents),
       |bm AS (
       |  SELECT t.doc_id,
       |    round(sum(i.idf * t.tf * ${K1 + 1}
       |      / (t.tf + $K1 * (1 - $B + $B * d.dl / (SELECT avgdl FROM n)))), 6) AS score
       |  FROM tf t JOIN idf i ON t.tok = i.tok JOIN dl d ON t.doc_id = d.doc_id
       |  GROUP BY t.doc_id)""".stripMargin

  /** Reciprocal-rank fusion of a lexical (doc_id, lex_rank) and a
    * dense (vec_id, vec_rank) ranking: rrf = Σ 1/(RrfK + rank) over
    * the legs a doc appears in; absent legs contribute 0 and surface
    * as rank −1. Full-outer on id — a doc surfaced by either leg
    * stays in the fused list. */
  private[ops] def rrfFuse(
      lex: org.apache.spark.sql.DataFrame,
      vec: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    lex.join(vec, col("doc_id") === col("vec_id"), "full_outer")
      .select(
        coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        coalesce(col("lex_rank"), lit(-1L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(-1L)).as("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6).as("rrf"))

  val all: Seq[QueryDef] = Seq(

    // BM25 against a fixed term set. idf = ln((N - df + .5)/(df + .5) + 1)
    // (the Robertson-Sparck Jones smooth form); dl/avgdl length
    // normalization with k1/b defaults.
    QueryDef(
      "q_bm25",
      s"""WITH $bm25CtesSql
         |SELECT doc_id, score FROM bm
         |ORDER BY score DESC, doc_id
         |LIMIT 100""".stripMargin) { (s, d) =>
      bm25Scores(s, d)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(100)
    },

    // Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25)
    // and dense (cosine-to-query-vector) rankings — the standard
    // two-tower curation/hard-negative-mining primitive. Each leg is
    // ranked on its ROUNDED score (float-ranking rule) so the integer
    // ranks are engine-exact; rrf = Σ 1/(RrfK + rank) over the legs a
    // doc appears in (two correctly-rounded divisions + one add —
    // deterministic), ranked on the rounded fusion score. Both top-100
    // legs are bounded frames, so the rank windows never see more than
    // 100 rows — no global window over corpus-sized data.
    QueryDef(
      "q_hybrid_rrf",
      s"""WITH $bm25CtesSql,
         |lex AS (
         |  SELECT doc_id, r FROM (
         |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM bm)
         |  WHERE r <= 100),
         |e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
         |  FROM embeddings),
         |q AS (SELECT emb AS q_emb, norm AS q_norm FROM e WHERE vec_id = 0),
         |cosr AS (
         |  SELECT vec_id,
         |    round(list_dot_product(emb, q_emb) / (norm * q_norm), 6) AS cosine
         |  FROM e, q WHERE vec_id <> 0),
         |vec AS (
         |  SELECT vec_id, r FROM (
         |    SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS r FROM cosr)
         |  WHERE r <= 100)
         |SELECT coalesce(l.doc_id, v.vec_id) AS doc_id,
         |  coalesce(l.r, -1) AS lex_rank, coalesce(v.r, -1) AS vec_rank,
         |  round(coalesce(1.0 / ($RrfK + l.r), 0) + coalesce(1.0 / ($RrfK + v.r), 0), 6) AS rrf
         |FROM lex l FULL OUTER JOIN vec v ON v.vec_id = l.doc_id
         |ORDER BY rrf DESC, doc_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val lex = bm25Scores(s, d)
        .orderBy(col("score").desc, col("doc_id")).limit(100)
        .withColumn("r",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("r").cast(LongType).as("lex_rank"))
      val vec = SimilarityOps.cosineTopK(Tables.embeddings(s, d), col("vec_id") === 0, 100)
        .select(col("vec_id"), col("rank").as("vec_rank"))
      rrfFuse(lex, vec).orderBy(col("rrf").desc, col("doc_id"))
    },

    // Sparse TF-IDF cosine: top-50 most lexically similar doc pairs via
    // the inverted-index self-join (shuffle key = token). The oracle
    // recomputes it relationally in DuckDB; ties at equal rounded cosine
    // (the planted exact dups all hit 1.0) break on (d1, d2).
    //
    // The pair space is bounded by a deterministic md5 block (the
    // q_hash_sample convention, 1/8 of docs): this corpus's 31-token
    // vocabulary defeats the max-df cut — EVERY token is a stop token —
    // and the unblocked join degenerates to all-pairs (measured: 123 s
    // at sf0.1 vs ~2 s blocked). At production scale this is exactly
    // blocked similarity search: each block joins internally in one
    // bounded pass, blocks stream independently.
    QueryDef(
      "q_sparse_cosine",
      """WITH docs_b AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM docs_b),
        |tf AS (
        |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM docs_b)
        |  GROUP BY 1, 2),
        |idf AS (SELECT tok, ln((SELECT nd FROM n) / count(*)) AS idf FROM tf GROUP BY tok),
        |w AS (SELECT t.doc_id, t.tok, t.tf * i.idf AS w FROM tf t JOIN idf i ON t.tok = i.tok),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
        |dots AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dot
        |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, round(dot / (x.nrm * y.nrm), 6) AS cos
        |FROM dots JOIN nrm x ON d1 = x.doc_id JOIN nrm y ON d2 = y.doc_id
        |WHERE x.nrm > 0 AND y.nrm > 0
        |ORDER BY cos DESC, d1, d2
        |LIMIT 50""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .filter(substring(md5(col("doc_id").cast("string")), 1, 1).isin("0", "1"))
      val nd = docs.count().toDouble
      val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).cast(DoubleType).as("tf"))
      val idf = tf.groupBy("tok").agg(log(lit(nd) / count(lit(1))).as("idf"))
      val w = tf.join(broadcast(idf), "tok")
        .select(col("doc_id"), col("tok"), (col("tf") * col("idf")).as("w"))
      val nrm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      val a = w.select(col("doc_id").as("d1"), col("tok"), col("w").as("w1"))
      val b = w.select(col("doc_id").as("d2"), col("tok"), col("w").as("w2"))
      a.join(b, Seq("tok"))
        .filter(col("d1") < col("d2"))
        .groupBy("d1", "d2")
        .agg(sum(col("w1") * col("w2")).as("dot"))
        .join(broadcast(nrm.select(col("doc_id").as("d1"), col("nrm").as("n1"))), "d1")
        .join(broadcast(nrm.select(col("doc_id").as("d2"), col("nrm").as("n2"))), "d2")
        // zero-norm guard (all-idf-0 doc): ANSI mode makes the division
        // throw rather than produce inf/NaN
        .filter(col("n1") > 0 && col("n2") > 0)
        .select(col("d1"), col("d2"), round(col("dot") / (col("n1") * col("n2")), 6).as("cos"))
        .orderBy(col("cos").desc, col("d1"), col("d2"))
        .limit(50)
    },

    // Per-type z-score screening: events whose value sits > 1.5 sample
    // standard deviations from the type mean (the driver's uniform value
    // distribution tops out near |z| ≈ 1.7, so 1.5 keeps the screen
    // non-vacuous while still exercising the tail).
    QueryDef(
      "q_zscore_outlier",
      """WITH s AS (
        |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - s.mu) / s.sd, 6) AS z
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 1.5
        |ORDER BY e.event_type, e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      // sd > 0 guard BEFORE the division: a constant-valued group has
      // sd = 0 and ANSI mode (Spark 4 default) turns the division into
      // a DIVIDE_BY_ZERO error, not an inf
      val stats = ev.groupBy("event_type")
        .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"))
        .filter(col("sd") > 0)
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", (col("value") - col("mu")) / col("sd"))
        .filter(abs(col("z")) > 1.5)
        .select(col("event_id"), col("event_type"), col("value"), round(col("z"), 6).as("z"))
        .orderBy("event_type", "event_id")
    })
}
