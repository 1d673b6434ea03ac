package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{SpaceSavingAgg, TopKAgg}

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
    },

    // Per-key top-k through the bounded TopKAgg aggregate (map-side
    // O(k) buffers, no whole-partition sort) — checked against the
    // exact window formulation the DuckDB oracle runs.
    QueryDef(
      "q_topk_per_key",
      """WITH r AS (
        |  SELECT l_returnflag, l_extendedprice AS price,
        |    l_orderkey * 10 + l_linenumber AS uid,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey * 10 + l_linenumber ASC) AS rn
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(rn AS BIGINT) AS rn,
        |  round(price, 6) AS price, uid
        |FROM r WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin) { (s, d) =>
      import s.implicits._
      val agg = new TopKAgg(5)
      Tables.lineitem(s, d)
        .select(
          col("l_returnflag"),
          col("l_extendedprice").cast(DoubleType),
          (col("l_orderkey") * 10 + col("l_linenumber")).cast(LongType))
        .as[(String, Double, Long)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(agg.toColumn)
        .toDF("l_returnflag", "topk")
        .select(col("l_returnflag"), posexplode(col("topk.items")).as(Seq("pos", "e")))
        .select(
          col("l_returnflag"),
          (col("pos") + 1).cast(LongType).as("rn"),
          round(col("e.value"), 6).as("price"),
          col("e.id").as("uid"))
        .orderBy("l_returnflag", "rn")
    })
}
