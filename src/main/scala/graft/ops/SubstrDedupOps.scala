package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EXACT substring deduplication (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" — the ExactSubstr
  * policy): find, corpus-wide, every maximal character span that
  * belongs to some duplicated substring of length ≥ L, and optionally
  * scrub those spans from the text. This is the character-exact
  * complement of the repo's gram-HEURISTIC span dedup
  * ([[TextOps3]] q_span_dedup): that one votes on 5-gram token
  * evidence; this one returns exactly the byte ranges a suffix array
  * would.
  *
  * Equivalence to the paper's suffix array, without building one: a
  * character position p lies inside a duplicated substring of length
  * ≥ L  ⟺  at least one of the L-windows covering p occurs twice in
  * the corpus (⇒: a duplicated m ≥ L substring duplicates each of its
  * L-windows; ⇐: a duplicated L-window IS a duplicated substring of
  * length L). So hashing every overlapping L-window and keeping the
  * recurring ones marks the SAME character set the suffix-array scan
  * marks, up to hash collisions. The default key is the
  * `window_hashes` rolling kernel (Karp–Rabin mod 2^61-1,
  * [[graft.functions.HashKernels.windowHashes]]): ONE O(n) pass emits
  * every window's 61-bit key, where the earlier per-position
  * `xxhash64(substr(text, pos, L))` enumeration paid O(n·L) hash work
  * plus an L-char substring copy per window (that xxhash64 form had
  * itself measured 2.3× over md5's 32-char string keys; both remain
  * available via the explicit `hash` parameter, and SubstrDedupSpec
  * proves all three key choices return identical span sets while the
  * DuckDB oracle independently re-derives them via md5). A ~64-bit
  * key's collision expectation reaches ~1 only near √p ≈ 10⁹ distinct
  * windows — beyond that (a true 100 TB corpus is ~10¹⁴ windows) pass
  * an explicit 128-bit `hash`, e.g.
  * `c => struct(xxhash64(c), xxhash64(reverse(c)))` or `md5`; a
  * collision only ever over-marks a span (false duplicate), never
  * misses one.
  *
  * Scale shape (the part a suffix array can't do distributed): the
  * corpus never shuffles text — each doc emits (hash, doc_id, pos)
  * triples map-side (one per character, the same O(n) a suffix array
  * costs); the recurring-window set comes from a true map-side partial
  * aggregate on the window hash (only (h, count) partials cross its
  * exchange) semi-joined back to positions with a streaming probe — see
  * [[dupWindows]] for why neither a count-over-window nor a shared
  * explicit repartition survives at scale; and the island merge is one
  * shuffle on doc_id with a per-doc sorted window — bounded by the
  * doc's own duplicated positions, never a global sort.
  */
object SubstrDedupOps {

  /** (doc_id, pos) of every 1-based position whose L-window recurs
    * corpus-wide. `hash = None` (the default) enumerates windows with
    * the O(n) rolling kernel; `Some(hf)` maps each window STRING
    * through `hf` instead — the md5 oracle twin's path, and the
    * 128-bit escape hatch past ~10⁹ windows (see object doc).
    */
  private def dupWindows(docs: DataFrame, minLen: Int,
      hash: Option[Column => Column]): DataFrame = {
    val w = hash match {
      case None =>
        // one kernel call per doc emits all window keys; posexplode
        // recovers the 1-based window start from the array index
        docs
          .filter(length(col("text")) >= minLen)
          .select(col("doc_id"),
            posexplode(graft.functions.HashFunctions.window_hashes(col("text"), minLen)))
          .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("h"))
      case Some(hf) =>
        docs
          .filter(length(col("text")) >= minLen) // sequence(1, n<1) would be a DESCENDING range
          .select(
            col("doc_id"),
            explode(sequence(lit(1), length(col("text")) - minLen + 1)).as("pos"),
            col("text"))
          .select(col("doc_id"), col("pos"),
            hf(col("text").substr(col("pos"), lit(minLen))).as("h"))
    }
    // Recurring windows via groupBy + semi-join-back, NOT
    // `count(*) over (partition by h)`: the window form shares a single
    // exchange but WindowExec buffers each hash group WHOLE on its
    // reducer — a boilerplate 40-char window (license headers) repeated
    // 1e8 times at corpus scale becomes one task's in-memory group
    // buffer. Here the recurring-hash set is built by a true map-side
    // partial aggregate (only per-partition (h, count) partials cross
    // its exchange) and joins back as a left-semi that STREAMS the
    // probe side — worst-case skew costs a sort spill, never a
    // monolithic buffer. Price: the explode+hash map pass runs once per
    // side (the two subtrees' exchanges differ, so ReusedExchange
    // cannot dedup, and an explicit shared repartition(h) doesn't
    // survive the optimizer — PushDownLeftSemiAntiJoin rewrites the
    // join back below it). That pass is embarrassingly parallel,
    // skew-free, and cheaper than caching O(corpus-chars) triples; at
    // oracle SF AQE broadcasts the dup set so the probe side never
    // exchanges on h at all. Text never reaches an exchange either way.
    // The hot hash's positions still land on one partition in the SMJ
    // case, but they are exactly the rows the operator must RETURN —
    // output, not blowup.
    val dup = w.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select("h")
    w.join(dup, Seq("h"), "left_semi")
      .select("doc_id", "pos")
  }

  /** Maximal duplicated spans per doc: (doc_id, span_start, span_end),
    * 1-based inclusive character ranges, each the union of overlapping
    * or adjacent duplicated L-windows. Integer arithmetic end to end —
    * hash-oracle-stable by construction.
    */
  def duplicatedSpans(
      docs: DataFrame, minLen: Int = 40,
      hash: Option[Column => Column] = None): DataFrame = {
    val wPrev = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    dupWindows(docs, minLen, hash)
      // islands: a window starts a new span iff it begins past the
      // furthest coverage of all earlier windows (+1: ADJACENT windows
      // form contiguous coverage and must merge)
      .withColumn("prev_end", max(col("pos") + minLen - 1).over(wPrev))
      .withColumn("new_island",
        when(col("pos") > coalesce(col("prev_end"), lit(-1)) + 1, 1).otherwise(0))
      .withColumn("island", sum(col("new_island")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        min(col("pos")).cast(LongType).as("span_start"),
        max(col("pos") + minLen - 1).cast(LongType).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** The dedup ACTION: cut every span out of its doc's text (the paper
    * drops the repeated bytes, keeping one copy corpus-wide only by
    * virtue of span asymmetry; this is the simpler drop-all policy its
    * §4 ablates). Pure string folds — no UDF: the span list aggregates
    * per doc and an `aggregate` HOF stitches the kept pieces.
    */
  def scrubSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val agg = spans.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end")))).as("sp"))
    docs.join(agg, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("sp").isNull, col("text")).otherwise(expr(
          """concat(
            |  aggregate(sp, named_struct('cur', 1, 'acc', ''),
            |    (st, x) -> named_struct(
            |      'cur', CAST(x.span_end + 1 AS INT),
            |      'acc', concat(st.acc,
            |        substring(text, st.cur, CAST(x.span_start AS INT) - st.cur))),
            |    st -> st.acc),
            |  substring(text, aggregate(sp, 1,
            |    (c, x) -> CAST(x.span_end + 1 AS INT)), length(text)))""".stripMargin)))
      .select(col("doc_id"), col("clean_text"))
  }

  val all: Seq[QueryDef] = Seq(
    // Maximal duplicated-substring spans (L = 40 chars) over documents.
    // Spark runs the PRODUCTION rolling-kernel keys (window_hashes,
    // Karp–Rabin mod 2^61-1); DuckDB re-derives the whole pipeline
    // (windows → recurring hashes → island merge) with md5 keys and
    // identical integer arithmetic — the span sets agree iff both hash
    // choices partition the window strings identically, so the oracle
    // checks the operator AND the 61-bit key's adequacy at this corpus
    // size in one compare.
    QueryDef(
      "q_substr_dedup",
      """WITH p AS (
        |  SELECT doc_id, text, unnest(generate_series(1, length(text) - 39)) AS pos
        |  FROM documents WHERE length(text) >= 40),
        |w AS (SELECT doc_id, pos, md5(substring(text, CAST(pos AS INT), 40)) AS h FROM p),
        |dup AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
        |dw AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)),
        |flag AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos > coalesce(max(pos + 39) OVER (
        |      PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |    THEN 1 ELSE 0 END AS new_island
        |  FROM dw),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |  FROM flag),
        |spans AS (
        |  SELECT doc_id,
        |    CAST(min(pos) AS BIGINT) AS span_start,
        |    CAST(max(pos + 39) AS BIGINT) AS span_end
        |  FROM isl GROUP BY doc_id, island)
        |SELECT doc_id, span_start, span_end, span_end - span_start + 1 AS span_len
        |FROM spans ORDER BY doc_id, span_start""".stripMargin) { (s, d) =>
      duplicatedSpans(Tables.documents(s, d), minLen = 40)
        .withColumn("span_len", col("span_end") - col("span_start") + 1)
        .orderBy("doc_id", "span_start")
    },
    // The scrub ACTION (Lee et al. §4 drop-all policy): every doc's text
    // with its duplicated spans cut out. DuckDB re-derives the span set
    // with the same CTE chain, then re-assembles each doc character by
    // character, keeping exactly the positions outside every span — an
    // independent formulation of the same stitch the Spark `aggregate`
    // HOF performs (piece-wise substring concat), so agreement checks
    // the span semantics AND the splice arithmetic. The char explode is
    // oracle-only cost (~150k rows at sf0.01); the Spark side never
    // explodes characters.
    QueryDef(
      "q_substr_scrub",
      """WITH p AS (
        |  SELECT doc_id, text, unnest(generate_series(1, length(text) - 39)) AS pos
        |  FROM documents WHERE length(text) >= 40),
        |w AS (SELECT doc_id, pos, md5(substring(text, CAST(pos AS INT), 40)) AS h FROM p),
        |dup AS (SELECT h FROM w GROUP BY h HAVING count(*) > 1),
        |dw AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)),
        |flag AS (
        |  SELECT doc_id, pos,
        |    CASE WHEN pos > coalesce(max(pos + 39) OVER (
        |      PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |    THEN 1 ELSE 0 END AS new_island
        |  FROM dw),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |  FROM flag),
        |spans AS (
        |  SELECT doc_id,
        |    CAST(min(pos) AS BIGINT) AS span_start,
        |    CAST(max(pos + 39) AS BIGINT) AS span_end
        |  FROM isl GROUP BY doc_id, island),
        |covered AS (
        |  SELECT doc_id, unnest(generate_series(span_start, span_end)) AS pos FROM spans),
        |chars AS (
        |  SELECT doc_id, unnest(generate_series(1, length(text))) AS pos, text
        |  FROM documents),
        |kept AS (
        |  SELECT c.doc_id, c.pos, substring(c.text, CAST(c.pos AS INT), 1) AS ch
        |  FROM chars c ANTI JOIN covered v ON c.doc_id = v.doc_id AND c.pos = v.pos)
        |SELECT d.doc_id, coalesce(string_agg(k.ch, '' ORDER BY k.pos), '') AS clean_text
        |FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      scrubSpans(docs, duplicatedSpans(docs, minLen = 40)).orderBy("doc_id")
    })
}
