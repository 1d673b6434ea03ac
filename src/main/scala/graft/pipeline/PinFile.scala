package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Tiny atomic pin-file IO shared by the persisted stores
  * ([[PretrainExport]] params, [[DedupIndex]] geometry, [[AnnIndex]]
  * postings mode). Pins are create-once metadata beside a table; the
  * failure mode this module exists for is a crash mid-`fs.create`
  * leaving a TRUNCATED pin — the store then refuses to re-init
  * (file exists) while every read half-parses with a raw
  * ArrayIndexOutOfBounds. Temp + rename makes the pin appear atomically
  * or not at all, and the reader fails malformed content loudly.
  */
private[pipeline] object PinFile {

  /** Atomically publish a small pin file: write a temp sibling, then
    * rename into place. On local and HDFS filesystems the rename fails
    * rather than clobbers when the target appeared concurrently, so
    * create-once stays create-once; the loser's temp is removed.
    * Returns whether THIS call's content is the one that landed. */
  def writeAtomic(spark: SparkSession, path: Path, content: String): Boolean = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.getParent,
      s".tmp_${path.getName}_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    val ok = fs.rename(tmp, path)
    if (!ok) fs.delete(tmp, false)
    ok
  }

  def read(spark: SparkSession, path: Path): String = {
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Parse `k=v,k=v` pin content; malformed content (a pin hand-edited,
    * or torn by a pre-atomic writer) fails with the path and the raw
    * content instead of a bare index-out-of-bounds deep in a split. */
  def readKv(spark: SparkSession, path: Path): Map[String, String] = {
    val s = read(spark, path)
    val pairs = s.split(",").map(_.split("=", 2))
    require(s.nonEmpty && pairs.forall(_.length == 2),
      s"malformed pin file $path: '$s' (expected k=v[,k=v...] — " +
        "restore it from the writer's format or rebuild the store)")
    pairs.map(a => a(0) -> a(1)).toMap
  }
}
