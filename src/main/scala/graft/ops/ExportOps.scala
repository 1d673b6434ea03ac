package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export: the dataloader-facing sink of the pipeline.
  *
  * Dataloaders want shards that are (a) EQUAL-SIZED — fixed rows per
  * shard, not Spark's arbitrary task splits, so step counts and
  * resume offsets are computable from the shard id alone; (b)
  * DETERMINISTIC — the same corpus exports byte-stable shard
  * membership and order, so a re-export after a lost volume
  * reproduces shard k exactly; (c) SELF-DESCRIBING — a manifest with
  * per-shard row counts and content checksums, so a training job can
  * fail fast on a truncated/corrupted shard instead of silently
  * training on half a shard.
  *
  * Spark-first shape: global row numbers come from the distributed
  * prefix sum ([[PackOps.exclusivePrefixSum]] — per-bucket totals +
  * broadcast base offsets, never a single-partition window), shard
  * assignment is `row div rowsPerShard`, and one hash exchange on the
  * shard id gives one file per shard via partitionBy. The checksum is
  * an order-independent sum of per-row xxhash64 over all columns, so
  * it can be recomputed by ANY engine scanning the shard in any order.
  * At 100 TB / 1M-row shards the manifest is ~100k entries — the one
  * deliberately driver-sized artifact (it must end up in a single
  * JSON file regardless).
  */
object ExportOps {

  final case class ShardInfo(id: Long, rows: Long, checksum: Long)
  final case class ShardManifest(
      rowsPerShard: Long, totalRows: Long, shards: Seq[ShardInfo])

  /** Per-row xxhash64 over every data column (sorted name order, shard
    * partition column excluded) as SQL text, so both the manifest agg
    * and the verifier build the identical expression. */
  private def hashExprSql(df: DataFrame): String =
    df.columns.filter(_ != "shard").sorted
      .map(c => s"`$c`").mkString("xxhash64(", ", ", ")")

  /** Export `df` ordered by `orderCol` (a unique key — ties would make
    * shard membership nondeterministic) into fixed-size shards under
    * `path/shard=<k>/`. Returns the manifest, also written to
    * `path/_shard_manifest.json`.
    */
  def writeShards(
      df: DataFrame, path: String, orderCol: String,
      rowsPerShard: Long): ShardManifest =
    writeShardsDropping(df, path, orderCol, rowsPerShard, Nil)

  /** Epoch-reshuffled shard export — the dataloader contract a
    * multi-epoch training run needs: each epoch's export is a DISTINCT
    * deterministic permutation of the same corpus (seeded md5 shuffle
    * key, the [[ProfileOps]] `q_corpus_shuffle` construction with the
    * unique id appended so the order never depends on md5-collision
    * luck — appended RAW, not zero-padded: md5 hex is fixed-width 32,
    * so the suffix only ever compares md5-equal keys, where uniqueness
    * is what matters and a fixed-width `lpad` would silently TRUNCATE
    * order keys longer than the pad and let distinct rows collide),
    * with the SAME manifest/checksum guarantees:
    * per-shard checksums differ per epoch (membership moved), but the
    * xor-fold of all shard checksums is epoch-INVARIANT (it telescopes
    * to the whole-corpus row-hash xor), so content identity across
    * epochs is verifiable from manifests alone — no data re-read. The
    * shuffle key is dropped before the write: epoch files carry
    * identical schema and identical total content, only the grouping
    * into shards moves.
    */
  def writeEpochShards(
      df: DataFrame, path: String, orderCol: String, epochSeed: Long,
      rowsPerShard: Long): ShardManifest = {
    val ek = SkewOps.freshName(df, "ekey")
    writeShardsDropping(
      df.withColumn(ek, epochKey(epochSeed, orderCol)),
      path, ek, rowsPerShard, Seq(ek))
  }

  private def writeShardsDropping(
      df: DataFrame, path: String, orderCol: String,
      rowsPerShard: Long, dropAtWrite: Seq[String]): ShardManifest = {
    val spark = df.sparkSession
    val one = SkewOps.freshName(df, "one")
    val rowNo = SkewOps.freshName(df, "row")
    val sharded = PackOps
      .exclusivePrefixSum(df.withColumn(one, lit(1L)), orderCol, one, rowNo)
      .withColumn("shard", expr(s"`$rowNo` div $rowsPerShard"))
      .drop(one, rowNo)
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(orderCol))
      // dropped AFTER the sort: a projection is narrow, so the
      // within-partition order survives while the helper key stays out
      // of the files (and out of the manifest's column checksum)
      .drop(dropAtWrite: _*)
      .write.partitionBy("shard").mode("overwrite").parquet(path)

    // manifest from ONE aggregate over what was just written (reading
    // back, not re-deriving: the checksums certify the files on disk)
    val written = spark.read.parquet(path)
    val infos = written
      .groupBy(col("shard").cast("long").as("shard"))
      // bit_xor, not sum: order-independent like sum but cannot
      // overflow (ANSI mode makes a wrapped long sum a runtime error)
      .agg(count(lit(1)).as("rows"),
        expr(s"bit_xor(${hashExprSql(written)})").as("checksum"))
      .orderBy("shard")
      .collect()
      .map(r => ShardInfo(r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val m = ShardManifest(rowsPerShard, infos.map(_.rows).sum, infos)
    val json = {
      val rows = m.shards.map(s =>
        s"""{"id":${s.id},"rows":${s.rows},"checksum":${s.checksum}}""")
      s"""{"rowsPerShard":${m.rowsPerShard},"totalRows":${m.totalRows},
         |"shards":[${rows.mkString(",")}]}""".stripMargin
    }
    val p = new org.apache.hadoop.fs.Path(path, "_shard_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    m
  }

  /** The manifest DERIVATION as a pure query — shard membership, row
    * counts, id ranges and content checksums straight from the corpus,
    * no files written. This is what makes the export contract
    * oracle-checkable: any engine that agrees on this frame will write
    * byte-identical shard membership, and [[verifyShards]]' checksums
    * certify the files against it. The row hash folds the (unbounded)
    * text column through md5 first so the canonical string stays
    * bounded, then takes a 60-bit integer from the row md5 — the same
    * cross-engine trick as the sampler/DSIR buckets
    * ([[SampleOps]]/[[DataSelectOps]]); bit_xor keeps the fold
    * order-independent, so shard-internal scan order never matters.
    */
  def shardManifestQuery(docs: DataFrame, rowsPerShard: Long): DataFrame =
    manifestOver(docs, (rowNo: String) => expr(s"`$rowNo` div $rowsPerShard"))

  /** Shared manifest derivation: prefix-sum row numbers, the caller's
    * shard-assignment expression over them, then one aggregate with
    * the cross-engine 60-bit md5 row checksum (bit_xor fold —
    * order-independent, overflow-free).
    *
    * NULL canon: every nullable token is coalesced to an explicit
    * sentinel BEFORE concatenation, on BOTH engines. concat_ws alone
    * silently SKIPS nulls (Spark and DuckDB agree on that, but a null
    * lang then collides with an absent field), while DuckDB's `||`
    * PROPAGATES null — md5(NULL) = NULL would be dropped from bit_xor
    * entirely, silently shrinking the checksum's coverage. The sentinel
    * keeps the canonical string total and unambiguous per field. */
  private val nullTok = "\u2400" // symbol-for-NUL sentinel, cannot collide with real lang/source text
  private def manifestOver(
      docs: DataFrame, shardOf: String => org.apache.spark.sql.Column): DataFrame = {
    val one = SkewOps.freshName(docs, "one")
    val rowNo = SkewOps.freshName(docs, "row")
    val canon = concat_ws("|",
      col("doc_id").cast("string"),
      coalesce(col("lang"), lit(nullTok)),
      coalesce(col("source"), lit(nullTok)),
      col("n_chars").cast("string"),
      coalesce(md5(col("text")), lit(nullTok)))
    PackOps
      .exclusivePrefixSum(docs.withColumn(one, lit(1L)), "doc_id", one, rowNo)
      .withColumn("shard", shardOf(rowNo))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"),
        bit_xor(conv(substring(md5(canon), 1, 15), 16, 10).cast("long"))
          .as("checksum"))
      .orderBy("shard")
  }

  private val manifestRowsPerShard = 64L
  private val stripeShards = 8L

  /** STRIPED shard assignment — `shard = row mod S` instead of
    * contiguous blocks. The other canonical dataloader layout:
    * contiguous shards preserve corpus order (resumable offsets,
    * locality); striped shards make every shard a uniform systematic
    * sample of the corpus (equal domain/temporal mix per shard, so any
    * subset of shards is an unbiased subsample and per-shard loss
    * curves are comparable). Same prefix-sum derivation, same
    * order-independent checksum — a striped shard's id range is the
    * whole corpus, so first/last become stride witnesses (min = shard
    * id, max = id of the last full stripe).
    */
  def stripedManifestQuery(docs: DataFrame, numShards: Long): DataFrame =
    manifestOver(docs, rowNo => pmod(col(rowNo), lit(numShards)))

  val all: Seq[QueryDef] = Seq(
    QueryDef("q_shard_stripe",
      s"""WITH numbered AS (
         |  SELECT *, row_number() OVER (ORDER BY doc_id) - 1 AS rn
         |  FROM documents)
         |SELECT rn % $stripeShards AS shard,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  bit_xor(('0x' || substr(md5(
         |    doc_id::VARCHAR || '|' || coalesce(lang, '␀') || '|' ||
         |    coalesce(source, '␀') || '|' ||
         |    n_chars::VARCHAR || '|' || coalesce(md5(text), '␀')), 1, 15))::BIGINT) AS checksum
         |FROM numbered GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      stripedManifestQuery(Tables.documents(s, d), stripeShards)
    },

    QueryDef("q_shard_manifest",
      s"""WITH numbered AS (
         |  SELECT *, row_number() OVER (ORDER BY doc_id) - 1 AS rn
         |  FROM documents)
         |SELECT rn // $manifestRowsPerShard AS shard,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  bit_xor(('0x' || substr(md5(
         |    doc_id::VARCHAR || '|' || coalesce(lang, '␀') || '|' ||
         |    coalesce(source, '␀') || '|' ||
         |    n_chars::VARCHAR || '|' || coalesce(md5(text), '␀')), 1, 15))::BIGINT) AS checksum
         |FROM numbered GROUP BY 1 ORDER BY shard""".stripMargin) { (s, d) =>
      shardManifestQuery(Tables.documents(s, d), manifestRowsPerShard)
    })

  /** The epoch-`epochSeed` shuffle key of a row, recomputed from the
    * row itself — [[writeEpochShards]]' exact construction (the key is
    * dropped from the files, but it is a pure function of (seed,
    * orderCol), so any reader can rebuild the within-shard order
    * without the writer's help). */
  def epochKey(epochSeed: Long, orderCol: String): org.apache.spark.sql.Column =
    concat(
      md5(concat_ws(":", lit(epochSeed).cast("string"), col(orderCol).cast("string"))),
      col(orderCol).cast("string"))

  /** Deterministic dataloader RESUME: the remaining stream of a
    * partially consumed epoch, from a (shard, offset) checkpoint —
    * skip-exact, so a training job that crashed mid-epoch replays
    * exactly the rows it had not yet consumed (no dropped rows, no
    * double-trained rows). The stream order is (shard asc, within-
    * shard `orderKey` asc) — the order the writer laid the files down
    * (`col(orderCol)` for [[writeShards]]; [[epochKey]] for
    * [[writeEpochShards]] exports, whose key is recomputable from the
    * rows). `offset` = rows of shard `shard` already consumed.
    *
    * Positions come from a per-SHARD window (bounded by rowsPerShard —
    * never a global sort): at 100k shards the plan is one exchange on
    * the shard id; a real loader resumes one shard locally, and this
    * frame is the whole-fleet restatement of that.
    */
  def resumeFrom(
      spark: SparkSession, path: String,
      orderKey: org.apache.spark.sql.Column,
      shard: Long, offset: Long): DataFrame = {
    val written = spark.read.parquet(path)
      .withColumn("shard", col("shard").cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(orderKey)
    written
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .filter(col("shard") > shard ||
        (col("shard") === shard && col("pos") >= offset))
      .orderBy(col("shard"), col("pos"))
  }

  /** Re-scan the shards and compare against the stored manifest.
    * Returns per-shard verdicts (shard, expected/actual rows,
    * checksum_ok); a missing or extra shard appears with nulls on the
    * absent side. The scan is one aggregate — no per-shard jobs.
    */
  def verifyShards(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(path, "_shard_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val entry = """\{"id":(-?\d+),"rows":(-?\d+),"checksum":(-?\d+)\}""".r
    val expected = entry.findAllMatchIn(json)
      .map(m => (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong))
      .toSeq.toDF("shard", "exp_rows", "exp_checksum")
    val written = spark.read.parquet(path)
    val actual = written
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("act_rows"),
        expr(s"bit_xor(${hashExprSql(written)})").as("act_checksum"))
    expected.join(actual, Seq("shard"), "full_outer")
      .select(col("shard"), col("exp_rows"), col("act_rows"),
        coalesce(col("exp_rows") === col("act_rows") &&
          col("exp_checksum") === col("act_checksum"), lit(false)).as("checksum_ok"))
      .orderBy("shard")
  }
}
