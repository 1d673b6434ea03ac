package graft.pipeline

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.ParquetReadOptions
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Native parquet row-group blooms (`BloomIndex.writeRowGroupBlooms`):
  * filters are physically present per row group, and a point probe for
  * an absent-but-in-range key skips row groups that min/max statistics
  * CANNOT (proven at the parquet-mr level, where the skip happens for
  * every reader including Spark's vectorized scan).
  */
class RowGroupBloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeTable(root: String): String = {
    // 200k rows, EVEN keys only, sorted so each row group covers a
    // distinct contiguous range; tiny block size forces many row groups
    val df = (0L until 200000L).map(i => (i * 2, i)).toDF("key", "id")
      .coalesce(1).sortWithinPartitions("key")
    BloomIndex.writeRowGroupBlooms(df, root, "key",
      ndvPerRowGroup = 20000, rowGroupBytes = 64 * 1024)
    new java.io.File(root).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(n => s"$root/$n").head
  }

  private def openReader(file: String, filter: Option[FilterCompat.Filter],
      bloom: Boolean): ParquetFileReader = {
    val in = HadoopInputFile.fromPath(
      new Path(file), spark.sparkContext.hadoopConfiguration)
    val b = ParquetReadOptions.builder()
      .useStatsFilter(true).useDictionaryFilter(true).useBloomFilter(bloom)
    filter.foreach(f => b.withRecordFilter(f))
    ParquetFileReader.open(in, b.build())
  }

  test("blooms are written per row group; an in-range absent key is skipped by bloom where stats cannot") {
    val root = graft.TestTmp.dir("rgbloom") + "/t"
    val file = writeTable(root)

    val plain = openReader(file, None, bloom = true)
    val blocks = plain.getRowGroups.asScala.toSeq
    assert(blocks.size > 3, s"need several row groups, got ${blocks.size}")
    // every row group carries a bloom for key, and key is NOT
    // dictionary-encoded (otherwise the bloom would be dead weight)
    blocks.foreach { b =>
      val colMeta = b.getColumns.asScala.find(_.getPath.toDotString == "key").get
      assert(plain.getBloomFilterDataReader(b).readBloomFilter(colMeta) != null,
        "bloom missing for a row group")
      assert(!colMeta.getEncodings.asScala.exists(_.toString.contains("DICTIONARY")),
        s"key must be plain-encoded, got ${colMeta.getEncodings}")
    }
    plain.close()

    // absent key 5555 (odd) sits INSIDE the first row group's [min,max]:
    // stats keep that group; the bloom kills it
    val probe = FilterCompat.get(FilterApi.eq(
      FilterApi.longColumn("key"), java.lang.Long.valueOf(5555L)))
    val statsOnly = openReader(file, Some(probe), bloom = false)
    val kept = statsOnly.getRowGroups.size
    statsOnly.close()
    assert(kept == 1, s"min/max stats alone must keep exactly the covering group, kept $kept")
    val withBloom = openReader(file, Some(probe), bloom = true)
    assert(withBloom.getRowGroups.isEmpty,
      "bloom must exclude the absent key's covering row group")
    withBloom.close()

    // a PRESENT key keeps its covering group under bloom filtering
    val hit = FilterCompat.get(FilterApi.eq(
      FilterApi.longColumn("key"), java.lang.Long.valueOf(5554L)))
    val withHit = openReader(file, Some(hit), bloom = true)
    assert(withHit.getRowGroups.size == 1)
    withHit.close()
  }

  test("Spark reads of the bloom-written table stay exact (dictionary off changes layout, never values)") {
    val root = graft.TestTmp.dir("rgbloom2") + "/t"
    writeTable(root)
    val df = spark.read.parquet(root)
    assert(df.filter(col("key") === 5555L).count() == 0)
    assert(df.filter(col("key") === 5554L).select("id").as[Long].head() == 2777L)
    assert(df.count() == 200000L)
    assert(df.filter(col("key").isin(0L, 5554L, 399998L)).count() == 3)
  }
}
