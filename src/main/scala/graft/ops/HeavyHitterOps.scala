package graft.ops

import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingAgg

/** Corpus vocabulary heavy hitters through the SpaceSaving typed
  * aggregate ([[graft.functions.SpaceSavingAgg]]): the token stream
  * never shuffles — per-partition capacity-bounded summaries do. With
  * capacity (64) above the corpus vocabulary size the sketch is exact
  * and err ≡ 0, so the DuckDB oracle is a plain exact GROUP BY top-k;
  * the genuinely approximate regime is covered by HeavyHitterSpec's
  * error-bound tests instead.
  */
object HeavyHitterOps {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_heavy_hitters",
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1)
        |SELECT token, cnt, CAST(0 AS BIGINT) AS err
        |FROM c ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin) { (s, d) =>
      import s.implicits._
      val agg = new SpaceSavingAgg(capacity = 64, k = 20)
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .as[String]
        .select(agg.toColumn)
        .select(explode(col("items")).as("h"))
        .select(col("h.token").as("token"), col("h.est").as("cnt"), col("h.err").as("err"))
        .orderBy(desc("cnt"), asc("token"))
    })
}
