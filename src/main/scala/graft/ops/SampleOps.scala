package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Weight-proportional sampling WITHOUT replacement, reproducibly
  * (Efraimidis–Spirakis 2006): each row draws key = u^(1/w) from a
  * per-row uniform u and weight w; the global top-k keys ARE a
  * w-proportional sample. The standard corpus-curation move for
  * quality-weighted subsampling (upweight curated sources, downweight
  * crawl) — and unlike rand()-based samplers it is deterministic across
  * reruns, engines, and repartitioning, because u derives from
  * md5(doc_id), not an RNG.
  *
  * Engine-exactness by construction (the q_domain_mix discipline,
  * hardened): u = first 52 md5 bits / 2^52 — a dyadic rational a double
  * holds EXACTLY (52-bit integer, power-of-two divisor; the division is
  * exact, not merely correctly rounded). Weights are restricted to
  * powers of two {1, 2, 4} so u^(1/w) is an iterated sqrt — sqrt is
  * IEEE-754 CORRECTLY ROUNDED everywhere, unlike pow/ln, so Spark and
  * DuckDB compute bit-identical keys and the top-k boundary cannot
  * flip between engines. General real weights would need one engine's
  * pow; that variant belongs behind a tolerance compare, not the hash
  * oracle.
  *
  * Scale shape: one scan, per-row projection (md5 + sqrt), then
  * TakeOrderedAndProject for the top-k — no shuffle of data rows, no
  * single-partition window.
  */
object SampleOps {

  val all: Seq[QueryDef] = Seq(

    QueryDef(
      "q_weighted_sample",
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CASE CAST(substring(source, 4) AS INT) % 3
        |      WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS weight,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |      AS DOUBLE) / 4503599627370496.0 AS u
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, source, weight,
        |    CASE weight WHEN 1 THEN u WHEN 2 THEN sqrt(u) ELSE sqrt(sqrt(u)) END AS key
        |  FROM w)
        |SELECT doc_id, source, CAST(weight AS BIGINT) AS weight, key
        |FROM k ORDER BY key DESC, doc_id LIMIT 200""".stripMargin) { (s, d) =>
      val u = (conv(substring(md5(col("doc_id").cast(StringType)), 1, 13), 16, 10)
        .cast(LongType).cast(DoubleType) / lit(4503599627370496.0)) // 2^52
      val weight = (substring(col("source"), 4, 10).cast(IntegerType) % 3) match {
        case m => when(m === 0, 1L).when(m === 1, 2L).otherwise(4L)
      }
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), weight.as("weight"), u.as("u"))
        .withColumn("key",
          when(col("weight") === 1, col("u"))
            .when(col("weight") === 2, sqrt(col("u")))
            .otherwise(sqrt(sqrt(col("u")))))
        .select(col("doc_id"), col("source"), col("weight"), col("key"))
        .orderBy(col("key").desc, col("doc_id"))
        .limit(200)
    })
}
