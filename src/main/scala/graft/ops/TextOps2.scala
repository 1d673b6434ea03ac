package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level text operators: vocabulary building (word count), a
  * BPE-ish regex tokenizer, and a deterministic salted skew join whose
  * result is oracle-checked against its plain-join equivalent.
  */
object TextOps2 {

  /** Salted join for skewed keys: the skewed (left) side gets a
    * deterministic per-row salt in [0, n); the small right side is
    * replicated n× — the hot key's rows now land on n reducers instead of
    * one. Result is identical to the unsalted join, which is exactly what
    * the oracle checks.
    */
  def saltedJoin(
      left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      key: String,
      n: Int): org.apache.spark.sql.DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.toIndexedSeq.map(col): _*)), lit(n)))
    val replicated = right.withColumn("__salt", explode(array((0 until n).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  val all: Seq[QueryDef] = Seq(

    // Vocabulary: corpus-wide token counts, top 100. explode → one
    // shuffle with map-side partial counts.
    QueryDef(
      "q_wordcount",
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token
        |ORDER BY cnt DESC, token LIMIT 100""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(100)
    },

    // BPE-ish pre-tokenizer: word / non-word-run split via regex
    // (the GPT-2 pre-tokenizer's shape without the unicode classes).
    QueryDef(
      "q_bpe_tokens",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]+')) AS BIGINT) AS n_bpe,
        |  CAST(len(list_distinct(regexp_extract_all(text, '\w+|[^\w\s]+'))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]+"), lit(0))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(toks).cast(LongType).as("n_bpe"),
          size(array_distinct(toks)).cast(LongType).as("n_distinct"))
        .orderBy("doc_id")
    },

    // Salted skew join: events (user_id is the skewable key) joined to a
    // derived per-user dimension through the salted path; the oracle runs
    // the PLAIN join — identical results prove salting is semantics-free.
    QueryDef(
      "q_join_salted",
      """WITH dim AS (
        |  SELECT DISTINCT user_id, user_id % 5 AS cohort FROM events)
        |SELECT e.event_id, e.user_id, d.cohort
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_id", "user_id")
      val dim = e.select(col("user_id")).distinct()
        .withColumn("cohort", col("user_id") % 5)
      saltedJoin(e, dim, "user_id", 8)
        .select("event_id", "user_id", "cohort")
        .orderBy("event_id")
    })
}
