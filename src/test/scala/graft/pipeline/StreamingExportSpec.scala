package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The landed-files → training-shards composition
  * ([[PretrainExport.runAvailableNow]]): a file-source stream driven
  * through the incremental export per micro-batch. What must hold:
  *  - streamed shards ≡ the one-shot append of the union (the
  *    incremental contract, now entered through a checkpointed
  *    stream);
  *  - a RESTART from the same checkpoint processes only files landed
  *    since (O(increment) — the already-exported corpus is never
  *    re-read), and the offsets continue;
  *  - the feed poll ([[PretrainExport.newShardsSince]]) across the
  *    restart returns exactly the new rows — the full producer →
  *    stream → shards → dataloader loop with every hop incremental.
  */
class StreamingExportSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def text(i: Long): String =
    s"the alpha$i beta$i gamma$i delta$i epsilon$i zeta$i " +
      s"eta$i theta$i and iota$i kappa$i"

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val f1 = Seq(1L -> text(1), 2L -> text(2), 3L -> text(3),
    4L -> text(2)) // near-dup of doc 2, same file
  private val f2 = Seq(11L -> text(11), 12L -> text(12))
  private val f3 = Seq(21L -> text(21), 22L -> text(3)) // cross-file dup of doc 3

  /** Land one flat parquet file (the producer's unit of delivery) —
    * written to a scratch dir, then the single part file moved into
    * the watched dir under a stable name. */
  private def land(dir: String, rows: Seq[(Long, String)], name: String): Unit = {
    val tmp = graft.TestTmp.dir(s"land-$name")
    mkDocs(rows).coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $tmp"))
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, s"$name.parquet"))
    ()
  }

  test("stream ≡ one-shot; restart picks up only new files; feed polls the delta") {
    val base = graft.TestTmp.dir("stream-export")
    val (src, root, ck) = (s"$base/src", s"$base/export", s"$base/ck")
    val tokCorpus = mkDocs(f1 ++ f2 ++ f3)
    PretrainExport.init(spark, root, tokCorpus,
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)
    val schema = mkDocs(Seq.empty).schema

    // land two files in sequence (mtime order = id order), stream them
    land(src, f1, "part1")
    Thread.sleep(1100) // file-source ordering is mtime-granular
    land(src, f2, "part2")
    PretrainExport.runAvailableNow(spark, src, schema, root, ck,
      maxFilesPerTrigger = Some(1))
    val vStreamed = PretrainExport.shardVersion(spark, root)
    assert(vStreamed >= 1L)
    val streamed = PretrainExport.shardTable(spark, root).collect()
      .map(_.mkString("|")).toSet

    // one-shot twin: the same union through a single batch append
    val oneRoot = s"$base/oneshot"
    PretrainExport.init(spark, oneRoot, tokCorpus,
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)
    PretrainExport.append(spark, oneRoot, mkDocs(f1 ++ f2))
    val oneShot = PretrainExport.shardTable(spark, oneRoot).collect()
      .map(_.mkString("|")).toSet
    assert(streamed === oneShot)

    // restart: a third file lands; the same checkpoint resumes and the
    // stream processes ONLY it (the exported corpus is not re-read —
    // a re-read would trip the append-only refusal loudly)
    land(src, f3, "part3")
    PretrainExport.runAvailableNow(spark, src, schema, root, ck)
    val vAfter = PretrainExport.shardVersion(spark, root)
    assert(vAfter === vStreamed + 1)

    // the dataloader poll across the restart: exactly the new rows,
    // composing with the pre-restart snapshot to the new snapshot
    val Some((pv, delta)) = PretrainExport.newShardsSince(spark, root, vStreamed)
    assert(pv === vAfter)
    val snapNow = PretrainExport.shardTable(spark, root).collect()
      .map(_.mkString("|")).toSet
    assert(streamed ++ delta.collect().map(_.mkString("|")).toSet === snapNow)
    // the cross-file dup (22 = doc 3's text) was dropped by the
    // persisted index, the novel doc (21) landed
    val ids = PretrainExport.shardTable(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(21L) && !ids.contains(22L))

    // replay the whole source against a FRESH checkpoint: every batch
    // replays, the guards absorb all of it, the table is unchanged
    PretrainExport.runAvailableNow(spark, src, schema, root, s"$base/ck2")
    assert(PretrainExport.shardTable(spark, root).collect()
      .map(_.mkString("|")).toSet === snapNow)
  }

  test("bounded trigger maintenance + async promotions + opt-in vacuum ≡ one-shot (r15)") {
    val base = graft.TestTmp.dir("stream-export-maint")
    val (src, root, ck) = (s"$base/src", s"$base/export", s"$base/ck")
    val f4 = Seq(31L -> text(31), 32L -> text(32))
    val tokCorpus = mkDocs(f1 ++ f2 ++ f3 ++ f4)
    PretrainExport.init(spark, root, tokCorpus,
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)
    val schema = mkDocs(Seq.empty).schema
    land(src, f1, "part1"); Thread.sleep(1100)
    land(src, f2, "part2"); Thread.sleep(1100)
    land(src, f3, "part3"); Thread.sleep(1100)
    land(src, f4, "part4")
    // threshold 0.5: every trigger fires the (level-0-only) maintain;
    // vacuum every firing at zero retention exercises the bounded-disk
    // configuration while the promoter thread races it
    PretrainExport.runAvailableNow(spark, src, schema, root, ck,
      maxFilesPerTrigger = Some(1),
      maintainThreshold = Some(0.5),
      vacuumEveryFirings = Some(1), vacuumRetainMs = 0L)

    // data parity with the one-shot twin — maintenance is pure layout
    val oneRoot = s"$base/oneshot"
    PretrainExport.init(spark, oneRoot, tokCorpus,
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)
    PretrainExport.append(spark, oneRoot, mkDocs(f1 ++ f2 ++ f3 ++ f4))
    assert(PretrainExport.shardTable(spark, root).collect().map(_.mkString("|")).toSet ===
      PretrainExport.shardTable(spark, oneRoot).collect().map(_.mkString("|")).toSet)

    // the in-stream vacuum bounded the version-dir sprawl: on disk the
    // shard root holds the live manifest dirs plus at most the tail the
    // final promotion superseded after the last in-stream vacuum
    val sRoot = s"$root/shards"
    val live = TxTable.latest(spark, sRoot)._2.values
      .flatMap(_.split("\t")).map(_.takeWhile(_ != '/')).toSet
    val onDisk = new java.io.File(sRoot).listFiles().map(_.getName)
      .filter(_.startsWith("v")).toSet
    assert(live.subsetOf(onDisk), s"live dirs missing from disk: ${live -- onDisk}")
    assert(onDisk.size <= live.size + 4,
      s"vacuum did not bound the sprawl: disk=${onDisk.size} live=${live.size}")
  }
}
