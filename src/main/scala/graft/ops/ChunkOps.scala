package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Context-window chunking with overlap — the pretraining/RAG document
  * splitter: each document becomes ceil-strided windows of C tokens
  * with C−S tokens of overlap between consecutive chunks (stride S),
  * the last window clamped to the tail. Pure per-row explode: one scan,
  * zero shuffle before the presentation sort — at 100 TB chunking is a
  * map stage, exactly as it must be.
  *
  * Chunk count = 1 + ceil(max(n−C, 0) / S) — integer arithmetic on both
  * engines (div), so the window set is engine-exact; chunk text is
  * emitted as md5 (the q_curate_corpus convention: the oracle compares
  * content identity without shipping full text through the dump).
  */
object ChunkOps {

  private val C = 64 // window size (tokens)
  private val S = 48 // stride (16-token overlap)

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_chunk_overlap",
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks,
         |    len(string_split(text, ' ')) AS n
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n, i AS chunk_id,
         |    toks[1 + i * $S : least(i * $S + $C, n)] AS chunk
         |  FROM t, unnest(generate_series(0, (greatest(n - $C, 0) + $S - 1) // $S)) AS g(i))
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(len(chunk) AS BIGINT) AS chunk_tokens,
         |  md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"), size(toks).as("n"))
        .select(
          col("doc_id"), col("n"), col("toks"),
          explode(sequence(
            lit(0),
            expr(s"(greatest(n - $C, 0) + ${S - 1}) div $S").cast(IntegerType))).as("chunk_id"))
        .select(
          col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
          slice(col("toks"), col("chunk_id") * S + 1,
            least(lit(C), col("n") - col("chunk_id") * S)).as("chunk"))
        .select(
          col("doc_id"), col("chunk_id"),
          size(col("chunk")).cast(LongType).as("chunk_tokens"),
          md5(array_join(col("chunk"), " ")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")
    })
}
