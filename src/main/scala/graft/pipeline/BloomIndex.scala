package graft.pipeline

import java.io.DataInputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Per-file bloom sidecars: file skipping past what min/max statistics
  * can do. Parquet footer min/max prune RANGE predicates — they are
  * useless for point lookups over high-cardinality keys scattered
  * through every file's value range (every file's [min, max] spans the
  * probe). A bloom per FILE answers "might this file contain key x?"
  * probabilistically with no false negatives, so a point-lookup reads
  * only the files whose blooms fire — with the table clustered by key
  * (TableLayout), that's O(1) files out of thousands.
  *
  * This is the library-level realization of "bloom pushdown into the
  * pruner" without a custom DataSource V2: `write` lays the table down
  * as data files + a `_bloom/` sidecar dir — ALL sidecars built by ONE
  * job (group by `input_file_name`, Spark's own BloomFilterAggregate
  * with map-side partial merge; a per-file loop would pay one full
  * job-scheduling round trip per file). `probeFiles` consults the
  * sidecars driver-side (numFiles × bloomBytes — the same scale as a
  * parquet footer pass) and hands Spark only the surviving paths; a
  * data file with NO sidecar (crash between data write and index
  * build, or a file added out-of-band) is conservatively kept — the
  * index degrades to a scan, never to a wrong or failing read.
  * Exactness is restored by the residual filter: bloom false positives
  * only cost a scanned file, never a wrong row.
  *
  * Convention: filters hold xxhash64(key) (the BloomFilterAggregate
  * contract, same as BloomOps); probes hash driver-side with the
  * identical expression.
  */
object BloomIndex {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bloomDir(path: String) = new org.apache.hadoop.fs.Path(path, "_bloom")

  /** xxhash64 of a driver-side value, bit-identical to `xxhash64(col)`
    * on executors (same Literal typing, same seed).
    */
  private def xxh(value: Any): Long =
    XxHash64(Seq(Literal(value)), 42L).eval(null).asInstanceOf[Long] // xxhash64()'s seed

  /** ROW-GROUP-granular bloom pruning via parquet's NATIVE filters —
    * the tier below the per-file sidecars, with no custom reader at
    * all: parquet-mr ≥1.12 writes an SBBF per row group when asked,
    * and every read whose pushed predicate pins `keyCol` to values
    * (`=`/`IN`) consults it during row-group filtering — Spark's
    * vectorized parquet scan included, because Spark pushes those
    * predicates into parquet-mr (`spark.sql.parquet.filterPushdown`,
    * on by default).
    *
    * Dictionary encoding is DISABLED for the key column on purpose:
    * a dictionary-encoded column is already exactly row-group-prunable
    * (the reader checks the dictionary), so blooms would be dead
    * weight — but real high-cardinality keys overflow the dictionary
    * and silently fall back to plain encoding mid-file, losing that
    * pruning exactly where tables are big. Plain + bloom is the
    * honest at-scale layout; `ndvPerRowGroup` sizes each filter.
    *
    * The three tiers compose on one table: `write` sidecars skip FILES,
    * these skip ROW GROUPS inside surviving files, the residual filter
    * drops rows. `RowGroupBloomSpec` proves the row-group skip at the
    * parquet-mr level (filtered row-group count < total for an absent
    * key that min/max stats cannot exclude).
    */
  def writeRowGroupBlooms(
      df: DataFrame, path: String, keyCol: String,
      ndvPerRowGroup: Long = 100000L, fpp: Double = 0.01,
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    df.write
      .option(s"parquet.bloom.filter.enabled#$keyCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$keyCol", ndvPerRowGroup.toString)
      .option(s"parquet.bloom.filter.fpp#$keyCol", fpp.toString)
      .option(s"parquet.enable.dictionary#$keyCol", "false")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
  }

  /** Write `df` to `path` (parquet) and build one bloom sidecar per
    * data file over `keyCol`, in ONE indexing job.
    * `expectedKeysPerFile` sizes the filters (~9.6 bits/key at the
    * default 1% fpp).
    */
  def write(
      df: DataFrame, path: String, keyCol: String,
      expectedKeysPerFile: Long = 1000000L, fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(path)
    val numBits = BloomFilter.optimalNumOfBits(expectedKeysPerFile, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedKeysPerFile), Literal(numBits)).toAggregateExpression()
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("_file"))
      .agg(ColumnBridge.column(agg).as("bf"))
      .collect()
    val hfs = fs(spark, path)
    hfs.mkdirs(bloomDir(path))
    perFile.foreach { r =>
      val name = new org.apache.hadoop.fs.Path(r.getString(0)).getName
      val out = hfs.create(
        new org.apache.hadoop.fs.Path(bloomDir(path), name + ".bloom"), true)
      try out.write(r.getAs[Array[Byte]](1)) finally out.close()
    }
  }

  /** Load a sidecar, or None when it is missing OR unreadable — a
    * truncated bloom from a crash mid-index-build must degrade to
    * "scan this file", never fail the read path (same contract as a
    * missing sidecar).
    */
  private def loadSidecar(
      hfs: org.apache.hadoop.fs.FileSystem, path: String, fileName: String): Option[BloomFilter] =
    try {
      val in = new DataInputStream(
        hfs.open(new org.apache.hadoop.fs.Path(bloomDir(path), fileName + ".bloom")))
      Some(try BloomFilter.readFrom(in) finally in.close())
    } catch { case _: java.io.IOException => None }

  /** Shared probe decision: keep the file when any key might be in its
    * bloom, or when it has no readable bloom at all.
    */
  private def survives(
      hfs: org.apache.hadoop.fs.FileSystem, path: String, fileName: String,
      hashes: Seq[Long]): Boolean =
    loadSidecar(hfs, path, fileName) match {
      case Some(bloom) => hashes.exists(bloom.mightContainLong)
      case None => true // unindexed or unreadable: conservative keep
    }

  /** Data-file paths whose blooms might contain ANY of `keys` —
    * driver-side sidecar pass, no executor work. Files without a
    * readable sidecar are kept (conservative: scan beats crash or
    * wrong skip).
    */
  def probeFiles(spark: SparkSession, path: String, keys: Seq[Any]): Seq[String] = {
    val hfs = fs(spark, path)
    val hashes = keys.map(xxh)
    hfs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .filter(f => survives(hfs, path, f.getName, hashes))
      .map(_.toString).toSeq
  }

  /** Point lookup through the index: read only the surviving files,
    * then apply the EXACT residual predicate (false positives die
    * here — results are identical to a full scan, proven in
    * BloomIndexSpec).
    */
  def lookup(spark: SparkSession, path: String, keyCol: String, keys: Seq[Any]): DataFrame = {
    val files = probeFiles(spark, path, keys)
    val keyColumn: Column = col(keyCol)
    if (files.isEmpty) {
      // preserve the schema without scanning data
      spark.read.parquet(path).filter(lit(false))
    } else {
      spark.read.parquet(files: _*).filter(keyColumn.isin(keys: _*))
    }
  }

  /** The PUSHED-DOWN form: a DataFrame whose SCAN consults the
    * sidecars. [[lookup]] prunes before planning; this integrates the
    * probe into Catalyst's own file listing (a custom `FileIndex` —
    * the planner hands it the pushed data filters, and point
    * predicates on the key column drop files at listing time), so a
    * plain `.filter(col(key) === x)` over the returned frame skips
    * files with NO index-aware call at the query site, composing with
    * whatever other predicates and projections Catalyst pushes.
    */
  def readIndexed(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    import org.apache.spark.sql.types.StructType
    val dataSchema = spark.read.parquet(path).schema
    val index = new BloomFileIndex(spark, path, keyCol, Some(dataSchema))
    // the relation below declares NO partition columns; a
    // Hive-partitioned dir (key=.../part-*.parquet) would make the
    // inherited listing infer a partition spec the relation cannot
    // represent — reject it loudly instead of reading nulls
    require(index.partitionSpec().partitionColumns.isEmpty,
      s"readIndexed expects a flat (non-Hive-partitioned) dir; $path has partition columns " +
        index.partitionSpec().partitionColumns.fieldNames.mkString(", "))
    val rel = HadoopFsRelation(
      index, StructType(Nil), dataSchema, None, new ParquetFileFormat, Map.empty)(spark)
    spark.baseRelationToDataFrame(rel)
  }

  /** [[InMemoryFileIndex]] that prunes its listing through the bloom
    * sidecars whenever the pushed data filters pin the key column to
    * specific values (`=`, `<=>`, `IN`); any other predicate shape
    * falls back to the full listing. Missing sidecars keep their file.
    */
  private[pipeline] class BloomFileIndex(
      spark: SparkSession, root: String, keyCol: String,
      userSchema: Option[org.apache.spark.sql.types.StructType])
    extends org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      spark, Seq(new org.apache.hadoop.fs.Path(root)), Map.empty, userSchema) {

    import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, EqualTo, Expression, In, InSet, Literal => Lit}
    import org.apache.spark.sql.execution.datasources.PartitionDirectory

    /** Internal-row key values pinned by a pushed filter, if the filter
      * restricts `keyCol` to a finite set.
      */
    private def pinnedKeys(f: Expression): Option[Seq[Long]] = f match {
      case EqualTo(a: Attribute, l: Lit) if a.name == keyCol =>
        Some(Seq(XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]))
      case EqualTo(l: Lit, a: Attribute) if a.name == keyCol =>
        Some(Seq(XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]))
      case EqualNullSafe(a: Attribute, l: Lit) if a.name == keyCol =>
        Some(Seq(XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]))
      case EqualNullSafe(l: Lit, a: Attribute) if a.name == keyCol =>
        Some(Seq(XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]))
      case In(a: Attribute, vs) if a.name == keyCol && vs.forall(_.isInstanceOf[Lit]) =>
        Some(vs.map(v => XxHash64(Seq(v), 42L).eval(null).asInstanceOf[Long]))
      case InSet(a: Attribute, vs) if a.name == keyCol =>
        Some(vs.toSeq.map(v =>
          XxHash64(Seq(Lit.create(v, a.dataType)), 42L).eval(null).asInstanceOf[Long]))
      case _ => None
    }

    // the sidecars are write-once beside the (cached) listing, and
    // every query over the frame re-enters listFiles — memoize the
    // deserialized blooms so planning doesn't re-open N files per query
    @transient private lazy val bloomCache =
      new java.util.concurrent.ConcurrentHashMap[String, Option[BloomFilter]]()

    override def refresh(): Unit = {
      bloomCache.clear()
      super.refresh()
    }

    private def cachedSurvives(fileName: String, hashes: Seq[Long]): Boolean =
      bloomCache.computeIfAbsent(fileName, n => loadSidecar(fs(spark, root), root, n)) match {
        case Some(bloom) => hashes.exists(bloom.mightContainLong)
        case None => true // unindexed or unreadable: conservative keep
      }

    override def listFiles(
        partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
      val base = super.listFiles(partitionFilters, dataFilters)
      // every pinning filter is conjunctive: intersect by probing the
      // tightest (fewest keys) one — probing more only re-passes files
      dataFilters.flatMap(pinnedKeys).sortBy(_.length).headOption match {
        case None => base
        case Some(hashes) =>
          base.map { pd =>
            PartitionDirectory(pd.values,
              pd.files.filter(f => cachedSurvives(f.getPath.getName, hashes)))
          }.filter(_.files.nonEmpty)
      }
    }
  }
}
