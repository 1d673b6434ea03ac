package graft.pipeline

import java.io.{DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  * as data files + a `_bloom/` sidecar dir (one filter per data file,
  * built from a projection-pruned per-file scan); `probeFiles` consults
  * the sidecars driver-side (numFiles × bloomBytes — the same scale as
  * a parquet footer pass) and hands Spark only the surviving paths.
  * Exactness is restored by the residual filter: bloom false positives
  * only cost a scanned file, never a wrong row.
  */
object BloomIndex {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write `df` to `path` (parquet) and build one bloom sidecar per
    * data file over `keyCol`. `expectedKeysPerFile` sizes the filters
    * (~9.6 bits/key at the default 1% fpp).
    */
  def write(
      df: DataFrame, path: String, keyCol: String,
      expectedKeysPerFile: Long = 1000000L, fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    df.write.mode("overwrite").parquet(path)
    val hfs = fs(spark, path)
    val files = hfs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    val bloomDir = new org.apache.hadoop.fs.Path(path, "_bloom")
    hfs.mkdirs(bloomDir)
    files.foreach { f =>
      // per-file, projection-pruned scan; the sketch builds distributed
      // and merges driver-side inside stat.bloomFilter
      val bloom = spark.read.parquet(f.toString)
        .stat.bloomFilter(keyCol, expectedKeysPerFile, fpp)
      val out = new DataOutputStream(
        hfs.create(new org.apache.hadoop.fs.Path(bloomDir, f.getName + ".bloom"), true))
      try bloom.writeTo(out) finally out.close()
    }
  }

  /** Data-file paths whose blooms might contain ANY of `keys` —
    * driver-side sidecar pass, no executor work.
    */
  def probeFiles(spark: SparkSession, path: String, keys: Seq[Any]): Seq[String] = {
    val hfs = fs(spark, path)
    hfs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .filter { f =>
        val in = new DataInputStream(
          hfs.open(new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(path, "_bloom"), f.getName + ".bloom")))
        val bloom = try BloomFilter.readFrom(in) finally in.close()
        keys.exists(k => bloom.mightContain(k))
      }
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
}
