package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON document per line) — the de-facto interchange format
  * for LLM training corpora (each line `{"doc_id":…,"lang":…,"text":…}`;
  * what every public corpus release and dataloader speaks). The
  * reference's ingest surface is line-oriented text over HTTP
  * (src/api/routes/data.py:39-68) and its responses are JSON arrays
  * (readings.py:25-49); this module is the corpus-scale version of both
  * directions:
  *
  *   - [[writeJsonl]]: deterministic JSONL export of a documents frame
  *     (stable field order, one line per doc) via Spark's text sink —
  *     map-shaped, no shuffle beyond the caller's partitioning.
  *   - [[readJsonl]]: schema'd JSONL scan with PERMISSIVE
  *     corrupt-record QUARANTINE — a malformed line lands in a corrupt
  *     column instead of silently vanishing or killing the job (the
  *     IngestStats why-count discipline applied to the file source).
  *     The schema is explicit, never inferred: at 100 TB a schema
  *     inference pass is a full extra scan, and drifting inferred types
  *     are the classic silent-corruption vector.
  *   - `q_jsonl_roundtrip`: the serialize → parse → extract path as an
  *     oracle-checked query — each engine round-trips its OWN JSON
  *     rendering (field values must survive exactly; the JSON string
  *     itself never surfaces, so engine-specific spacing/escaping
  *     differences cannot flake the hash), and a deliberately corrupt
  *     variant must parse to NULL on both.
  */
object JsonlOps {

  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("lang", StringType)
    .add("source", StringType).add("text", StringType)

  /** One JSONL line per document, fields in [[docSchema]] order. */
  def jsonLine: org.apache.spark.sql.Column =
    to_json(struct(col("doc_id"), col("lang"), col("source"), col("text")))

  /** Export as JSONL text files (one line per doc). */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.select(jsonLine.as("value")).write.mode("overwrite").text(path)

  /** Schema'd JSONL scan; malformed lines are QUARANTINED in
    * `_corrupt` (carrying the raw line for forensics/replay), never
    * silently dropped — callers split on `_corrupt IS NULL` and route
    * the rest to a quarantine sink. Implemented as a text scan +
    * `from_json` (one map pass, same codegen'd Jackson parse the json
    * reader runs) rather than `spark.read.json`'s PERMISSIVE mode: the
    * built-in corrupt column cannot be queried on its own from raw
    * files (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    * counting quarantined lines is exactly what an ingest audit does
    * first. Returns (doc_id, lang, source, text, _corrupt).
    */
  /** PERMISSIVE parse of one JSONL line into a ([[docSchema]] +
    * `_corrupt`) struct. The corrupt column must live INSIDE the
    * from_json schema: the parser populates it with the raw line on
    * failure (nulling the data fields), which distinguishes "malformed
    * line" from a VALID line whose fields are absent/null ("{}") — a
    * struct-level null check cannot (PERMISSIVE from_json nulls
    * fields, not the struct). Shared by [[readJsonl]] and the
    * streaming dead-letter tier
    * ([[graft.pipeline.CorpusIngest.ingestJsonlBatch]]).
    */
  def parsedStruct(line: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    from_json(
      line, docSchema.add("_corrupt", StringType),
      Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt"))

  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("p", parsedStruct(col("value")))
      .select(
        col("p.doc_id").as("doc_id"), col("p.lang").as("lang"),
        col("p.source").as("source"), col("p.text").as("text"),
        col("p._corrupt").as("_corrupt"))

  val all: Seq[QueryDef] = Seq(
    // serialize -> parse -> extract, plus a corrupt twin: each engine
    // round-trips its own rendering, so the hash compares FIELD VALUES
    // and null-quarantine verdicts, not JSON text
    QueryDef(
      "q_jsonl_roundtrip",
      """WITH j AS (
        |  SELECT doc_id, lang, text,
        |    to_json(struct_pack(doc_id := doc_id, lang := lang, text := text)) AS line
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, lang, text, line,
        |    CAST(line->>'$.doc_id' AS BIGINT) AS p_id,
        |    line->>'$.lang' AS p_lang,
        |    line->>'$.text' AS p_text,
        |    json_valid(substr(line, 2)) AS corrupt_parses
        |  FROM j)
        |SELECT doc_id,
        |  p_id = doc_id AND p_lang = lang AND p_text = text AS roundtrip_ok,
        |  CAST(length(p_text) AS BIGINT) AS text_len,
        |  corrupt_parses
        |FROM p ORDER BY doc_id""".stripMargin) { (s, d) =>
      val line = to_json(struct(col("doc_id"), col("lang"), col("text")))
      val schema = new StructType()
        .add("doc_id", LongType).add("lang", StringType).add("text", StringType)
      Tables.documents(s, d)
        .withColumn("line", line)
        .withColumn("p", from_json(col("line"), schema))
        // corrupt twin: malformed from the FIRST byte (opening brace
        // stripped) — a TRAILING-garbage variant is not cross-engine
        // testable (Jackson stops at the root object's close and
        // accepts, DuckDB's json_valid rejects)
        .withColumn("pc", from_json(substring(col("line"), 2, Int.MaxValue), schema))
        .select(
          col("doc_id"),
          (col("p.doc_id") === col("doc_id") && col("p.lang") === col("lang") &&
            col("p.text") === col("text")).as("roundtrip_ok"),
          length(col("p.text")).cast(LongType).as("text_len"),
          // PERMISSIVE from_json yields an all-null struct for a
          // malformed document — the quarantine verdict both engines
          // must agree on
          col("pc.doc_id").isNotNull.as("corrupt_parses"))
        .orderBy("doc_id")
    })
}
