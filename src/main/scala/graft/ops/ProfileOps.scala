package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Corpus-profiling and data-mixing operators — the "look at your data
  * before you train on it" extension surface (no reference analog; the
  * reference's closest habit is dbt's schema tests, which assert rather
  * than profile).
  *
  * Scale notes (100 TB bar):
  *   - q_profile is ONE scan: all per-column statistics ride a single
  *     aggregate (Spark plans the multi-distinct via Expand — 5× the agg
  *     input rows, still one pass over parquet). At production scale the
  *     exact `countDistinct` swaps for `approx_count_distinct` (HLL++,
  *     no Expand) — kept exact here because approximate sketches are not
  *     oracle-comparable across engines.
  *   - q_domain_mix shuffles nothing on the corpus side: per-domain
  *     acceptance cutoffs are a tiny aggregate broadcast back onto the
  *     fact scan, and the accept test is a deterministic md5-prefix
  *     compare (the q_hash_sample convention) — re-runnable, engine-
  *     independent, stable under repartitioning, no RNG in the plan.
  *   - q_dup_spans hashes every shingle BEFORE the shuffle: the wide
  *     text never rides the exchange, only (doc_id, gram_md5) pairs, and
  *     the group-by key is the 32-char hash. The emitted artifact
  *     (hash, doc count, first/last doc) is what a span-dedup pass
  *     consumes downstream.
  */
object ProfileOps {

  val all: Seq[QueryDef] = Seq(

    // Per-column corpus profile: row/null/distinct counts + min/max per
    // column of `documents`, long format, one row per column. The
    // first query any data-quality pass runs; min/max emitted as
    // strings so one schema covers every column type.
    QueryDef(
      "q_profile",
      """SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_val, CAST(max(doc_id) AS VARCHAR) AS max_val
        |FROM documents
        |UNION ALL
        |SELECT 'lang', CAST(count(*) AS BIGINT), CAST(count(*) - count(lang) AS BIGINT),
        |  CAST(count(DISTINCT lang) AS BIGINT), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(count(*) - count(n_chars) AS BIGINT),
        |  CAST(count(DISTINCT n_chars) AS BIGINT), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'source', CAST(count(*) AS BIGINT), CAST(count(*) - count(source) AS BIGINT),
        |  CAST(count(DISTINCT source) AS BIGINT), CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'text', CAST(count(*) AS BIGINT), CAST(count(*) - count(text) AS BIGINT),
        |  CAST(count(DISTINCT text) AS BIGINT), CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR)
        |FROM documents
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      // one aggregate row carrying every column's stats, then stack()
      // into long format — a single scan however many columns profile
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
        count(col(c)).as(s"cnt_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast(StringType).as(s"min_$c"),
        max(col(c)).cast(StringType).as(s"max_$c")))
      val wide = docs.agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(c =>
        s"'$c', n_rows, n_rows - cnt_$c, nd_$c, min_$c, max_$c").mkString(", ")
      wide.selectExpr(
          s"stack(${cols.length}, $stackArgs) AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)")
        .orderBy("col_name")
    },

    // Temperature-weighted domain mix (the multilingual-pretraining
    // resampling rule, α = 0.5): domain d with share p_d is resampled
    // toward p_d^α, realized by pure downsampling with per-domain
    // acceptance rate r_d = sqrt(c_min / c_d) — the smallest domain
    // keeps everything, big domains are flattened toward it. The accept
    // test compares an md5-derived 8-hex-digit uniform against a cutoff
    // derived from r_d; sqrt/divide/multiply/floor are all IEEE-exact,
    // so both engines compute the SAME cutoff string bit-for-bit.
    QueryDef(
      "q_domain_mix",
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
        |cut AS (SELECT lang,
        |  CASE WHEN c = (SELECT min(c) FROM c) THEN 'g'
        |       ELSE lower(lpad(hex(CAST(floor(sqrt(CAST((SELECT min(c) FROM c) AS DOUBLE) / c) * 4294967296.0) AS BIGINT)), 8, '0'))
        |  END AS cutoff
        |  FROM c)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cut ON d.lang = cut.lang
        |WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < cutoff
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      // c_min as a broadcast scalar joined onto the |domains| count rows
      // — no second corpus scan, no single-partition window
      val cut = counts
        .crossJoin(broadcast(counts.agg(min(col("c")).as("c_min"))))
        .withColumn("cutoff",
          when(col("c") === col("c_min"), lit("g")) // rate 1.0: every hex prefix < 'g'
            .otherwise(lower(lpad(
              hex(floor(sqrt(col("c_min").cast("double") / col("c")) * lit(4294967296.0))),
              8, "0"))))
        .select("lang", "cutoff")
      docs.join(broadcast(cut), "lang")
        .filter(substring(md5(col("doc_id").cast(StringType)), 1, 8) < col("cutoff"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Deterministic train/val/test split: assignment from an md5-uniform
    // on the doc id — 90/5/5 by hex-prefix range, so the split is
    // reproducible on any engine, stable under repartitioning, and new
    // docs land in a split without reshuffling old ones (the property
    // rand()-based splits lose). Emits the assignment, not three tables:
    // downstream writers partition by `split` in one pass.
    QueryDef(
      "q_split_assign",
      """SELECT doc_id, lang,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'f3333333' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val u = substring(md5(col("doc_id").cast(StringType)), 1, 8)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(u < "e6666666", "train") // 0xe6666666/2^32 = 0.9
            .when(u < "f3333333", "val") // next 0.05
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    },

    // Reproducible global corpus shuffle: every doc's POSITION in a total
    // order by md5(doc_id) — decorrelates training order from ingest
    // order identically on every run and engine; epoch reshuffles just
    // salt the key. A global `row_number()` window would drag the table
    // through ONE task, so the position is a distributed prefix sum of 1
    // over the shuffle key ([[PackOps.exclusivePrefixSum]]: deterministic
    // hash-sampled buckets, driver-side offset table, bucket-local
    // windows). The key gets the zero-padded doc id appended so it is
    // unique by construction — not by md5-collision luck.
    QueryDef(
      "q_corpus_shuffle",
      """SELECT CAST(row_number() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) || lpad(CAST(doc_id AS VARCHAR), 20, '0')) AS BIGINT) AS pos,
        |  doc_id
        |FROM documents
        |ORDER BY pos""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        concat(md5(col("doc_id").cast(StringType)),
          lpad(col("doc_id").cast(StringType), 20, "0")).as("shufkey"),
        lit(1L).as("one"))
      PackOps.exclusivePrefixSum(docs, "shufkey", "one", "acc")
        .select((col("acc") + lit(1L)).as("pos"), col("doc_id"))
        .orderBy("pos")
    },

    // Cross-document duplicated spans (the exact-substring flavor of
    // training-data dedup): every word 5-gram that appears in ≥2
    // distinct documents, with its document count and first/last
    // carrier. Downstream passes cut or attribute these spans; the
    // 5-gram is carried only as its md5, so the exchange moves
    // (doc_id, 32-char hash), never text.
    QueryDef(
      "q_dup_spans",
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([array_to_string(toks[i:i+4], ' ') FOR i IN range(1, greatest(len(toks) - 4, 0) + 1)])) AS gram
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  WHERE len(toks) >= 5)
        |SELECT md5(gram) AS gram_md5,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc,
        |  CAST(max(doc_id) AS BIGINT) AS last_doc
        |FROM g GROUP BY gram
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY gram_md5""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        // explicit ≥5-token guard to mirror the SQL: the shingle kernel
        // emits ONE whole-text shingle for shorter docs, which the
        // SQL's range comprehension does not
        .filter(size(split(col("text"), " ", -1)) >= 5)
        .select(col("doc_id"),
          explode(array_distinct(DedupOps.shingles(col("text"), 5))).as("gram"))
        .select(col("doc_id"), md5(col("gram")).as("gram_md5"))
        .groupBy("gram_md5")
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy("gram_md5")
    },

    // Span-cut dedup — the CONSUMER of q_dup_spans (Lee et al. '22
    // exact-substring dedup, re-expressed relationally): every token
    // position covered by a 5-gram that also appears in another doc is
    // cut, UNLESS this doc is the gram's first carrier (min doc_id) —
    // one canonical copy of every span survives corpus-wide. Emits the
    // reconstructed text per doc. Exchanges carry only (doc_id, pos)
    // pairs and 32-char hashes; text is reassembled once per doc at the
    // end (array_sort over the kept (pos, token) structs — collect_list
    // order is NOT deterministic, the sort is what restores it).
    QueryDef(
      "q_span_dedup",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, unnest([{'pos': i - 1, 'gram': array_to_string(toks[i:i+4], ' ')} FOR i IN range(1, greatest(len(toks) - 4, 0) + 1)], recursive := true)
        |  FROM toks WHERE len(toks) >= 5),
        |dup AS (
        |  SELECT md5(gram) AS h, min(doc_id) AS first_doc
        |  FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |cuts AS (
        |  SELECT DISTINCT g.doc_id, g.pos + off.off AS cutpos
        |  FROM g JOIN dup ON md5(g.gram) = dup.h AND g.doc_id <> dup.first_doc
        |  CROSS JOIN (SELECT unnest(range(0, 5)) AS off) off),
        |tk AS (
        |  SELECT doc_id, unnest([{'tpos': i - 1, 'tok': toks[i]} FOR i IN range(1, len(toks) + 1)], recursive := true)
        |  FROM toks),
        |kept AS (
        |  SELECT tk.doc_id, tk.tpos, tk.tok FROM tk
        |  LEFT JOIN cuts ON tk.doc_id = cuts.doc_id AND tk.tpos = cuts.cutpos
        |  WHERE cuts.doc_id IS NULL),
        |clean AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(c.clean_text, '') AS clean_text,
        |  coalesce(c.n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM documents d LEFT JOIN clean c ON d.doc_id = c.doc_id
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val g = docs
        .filter(size(split(col("text"), " ", -1)) >= 5)
        .select(col("doc_id"),
          posexplode(DedupOps.shingles(col("text"), 5)).as(Seq("pos", "gram")))
        .select(col("doc_id"), col("pos"), md5(col("gram")).as("h"))
      val dup = g.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") >= 2)
        .select("h", "first_doc")
      val cuts = g.join(dup, "h")
        .filter(col("doc_id") =!= col("first_doc"))
        .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + 4)).as("cutpos"))
        .distinct()
      val tk = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ", -1)).as(Seq("tpos", "tok")))
      val kept = tk.join(cuts,
        tk("doc_id") === cuts("doc_id") && tk("tpos") === cuts("cutpos"), "left_anti")
      val clean = kept.groupBy("doc_id").agg(
        array_join(
          transform(array_sort(collect_list(struct(col("tpos"), col("tok")))), x => x("tok")),
          " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
      docs.select("doc_id").join(clean, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("doc_id")
    })
}
