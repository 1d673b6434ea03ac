package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The incremental pretrain-export pipeline ([[PretrainExport]]):
  * incremental appends must equal a one-shot append of the union
  * (same shard table — offsets, stripes, checksums), replays must be
  * absorbed, a crash between the dedup commit and the shard commit
  * must converge on replay, and tokenizer refreshes must never touch
  * the export's pinned renderings.
  */
class PretrainExportPipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def mkDocs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Quality-passing doc with a doc-unique word set (3-shingle overlap
    * zero across distinct i, so no accidental near-dups): 12 words,
    * two stopwords (ratio 1/6), mean word length in bounds. */
  private def text(i: Long): String =
    s"the alpha$i beta$i gamma$i delta$i epsilon$i zeta$i " +
      s"eta$i theta$i and iota$i kappa$i"

  // batch 1: ids 1-6 — 5 quality docs (4 is an exact dup of 3's text),
  // plus a junk doc (id 6, too short) the quality gate drops
  private val b1 = Seq(
    1L -> text(1), 2L -> text(2), 3L -> text(3),
    4L -> text(3), // exact dup of doc 3
    5L -> text(5),
    6L -> "too short")
  // batch 2: ids 11-15, strictly above b1 — 13 dups doc 2 (cross-batch),
  // 15 dups 14 (within-batch)
  private val b2 = Seq(
    11L -> text(11), 12L -> text(12),
    13L -> text(2), // cross-batch dup of doc 2
    14L -> text(14),
    15L -> text(14)) // within-batch dup of doc 14

  private val tokCorpus = mkDocs(b1 ++ b2)

  private def freshRoot(tag: String): String =
    graft.TestTmp.dir(s"pretrain-export-$tag")

  private def initAt(root: String): Long =
    PretrainExport.init(spark, root, tokCorpus,
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)

  private def tableRows(root: String): Set[String] =
    PretrainExport.shardTable(spark, root).collect()
      .map(_.mkString("|")).toSet

  test("incremental appends equal a one-shot append of the union") {
    val incRoot = freshRoot("inc")
    val oneRoot = freshRoot("one")
    initAt(incRoot); initAt(oneRoot)

    val s1 = PretrainExport.append(spark, incRoot, mkDocs(b1))
    assert(s1.docsIn == 6 && s1.qualityKept == 5,
      s"quality gate: $s1") // junk doc dropped
    assert(s1.accepted == 4 && s1.appended == 4,
      s"dup 4->3 dropped: $s1")
    val s2 = PretrainExport.append(spark, incRoot, mkDocs(b2))
    assert(s2.accepted == 3 && s2.appended == 3,
      s"13 dups stored 2, 15 dups mate 14: $s2")

    val o = PretrainExport.append(spark, oneRoot, mkDocs(b1 ++ b2))
    assert(o.accepted == 7 && o.appended == 7, s"one-shot: $o")

    assert(tableRows(incRoot) == tableRows(oneRoot),
      "incremental shard table != one-shot shard table")
    // manifests too (same aggregate the oracle-green flagship emits)
    assert(
      PretrainExport.manifest(spark, incRoot).collect().map(_.toString).toSeq ==
        PretrainExport.manifest(spark, oneRoot).collect().map(_.toString).toSeq)
    // offsets are a contiguous exclusive prefix sum in doc order
    val rows = PretrainExport.shardTable(spark, incRoot)
      .orderBy("doc_id").collect()
    var expect = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_off") == expect,
        s"offset continuity broken at doc ${r.getAs[Long]("doc_id")}")
      expect += r.getAs[Long]("n_tokens")
    }
  }

  test("prepare + appendPrepared slices equal plain appends exactly (stats, table, manifest, replay)") {
    val plainRoot = freshRoot("prep-plain")
    val prepRoot = freshRoot("prep-sliced")
    initAt(plainRoot); initAt(prepRoot)

    val p1 = PretrainExport.append(spark, plainRoot, mkDocs(b1))
    val p2 = PretrainExport.append(spark, plainRoot, mkDocs(b2))

    val prep = PretrainExport.prepare(spark, prepRoot, mkDocs(b1 ++ b2))
    val s1 = PretrainExport.appendPrepared(spark, prepRoot, prep, 1L, 6L)
    val s2 = PretrainExport.appendPrepared(spark, prepRoot, prep, 11L, 15L)
    assert(s1 == p1, s"batch-1 stats diverged: prepared=$s1 plain=$p1")
    assert(s2 == p2, s"batch-2 stats diverged: prepared=$s2 plain=$p2")
    assert(tableRows(prepRoot) == tableRows(plainRoot),
      "prepared-slice shard table != plain-append shard table")
    assert(
      PretrainExport.manifest(spark, prepRoot).collect().map(_.toString).toSeq ==
        PretrainExport.manifest(spark, plainRoot).collect().map(_.toString).toSeq)

    // a replayed prepared slice is the same no-op as a replayed append
    val before = tableRows(prepRoot)
    val replay = PretrainExport.appendPrepared(spark, prepRoot, prep, 11L, 15L)
    assert(replay.appended == 0, s"replayed slice appended rows: $replay")
    assert(tableRows(prepRoot) == before)

    // an empty slice is a zero-stat no-op, not an error
    val empty = PretrainExport.appendPrepared(spark, prepRoot, prep, 100L, 200L)
    assert(empty == PretrainExport.AppendStats(0, 0, 0, 0), s"empty slice: $empty")

    // a prepared corpus from a DIFFERENTLY-parameterized export is refused
    val otherRoot = freshRoot("prep-other")
    PretrainExport.init(spark, otherRoot, tokCorpus,
      p = PretrainExport.Params(windowBudget = 128L),
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)
    val e = intercept[IllegalArgumentException] {
      PretrainExport.appendPrepared(spark, otherRoot, prep, 1L, 6L)
    }
    assert(e.getMessage.contains("different export params"))
  }

  test("replay of a committed batch is a pure no-op") {
    val root = freshRoot("replay")
    initAt(root)
    PretrainExport.append(spark, root, mkDocs(b1))
    PretrainExport.append(spark, root, mkDocs(b2))
    val before = tableRows(root)
    val replay = PretrainExport.append(spark, root, mkDocs(b2))
    assert(replay.appended == 0, s"replay appended rows: $replay")
    assert(tableRows(root) == before, "replay changed the shard table")
  }

  test("crash between dedup commit and shard commit converges on replay") {
    val full = freshRoot("full")
    initAt(full)
    PretrainExport.append(spark, full, mkDocs(b1))
    PretrainExport.append(spark, full, mkDocs(b2))

    val crash = freshRoot("crash")
    initAt(crash)
    PretrainExport.append(spark, crash, mkDocs(b1))
    // simulate the crash: run ONLY the dedup half of append(b2) — the
    // index commits, the shard table never hears about the batch
    DedupIndex.ingest(spark, s"$crash/dedup",
      graft.ops.PretrainExportOps.qualityKept(mkDocs(b2))).count()
    // replayed append finishes the missing half
    val replay = PretrainExport.append(spark, crash, mkDocs(b2))
    assert(replay.appended == 3, s"replay after crash: $replay")
    assert(tableRows(crash) == tableRows(full),
      "crash-replay table differs from the clean path")
  }

  test("non-replay append below the stored id range is refused") {
    val root = freshRoot("order")
    initAt(root)
    PretrainExport.append(spark, root, mkDocs(b1))
    PretrainExport.append(spark, root, mkDocs(b2))
    val e = intercept[IllegalArgumentException] {
      PretrainExport.append(spark, root, mkDocs(Seq(9L -> text(9))))
    }
    assert(e.getMessage.contains("append-only doc_id contract"))
  }

  test("tokenizer refresh bumps the store but never the pinned renderings") {
    val plain = freshRoot("plain")
    val refreshed = freshRoot("refreshed")
    initAt(plain); initAt(refreshed)
    PretrainExport.append(spark, plain, mkDocs(b1))
    PretrainExport.append(spark, refreshed, mkDocs(b1))

    val pinnedBefore = PretrainExport.pinnedModel(spark, refreshed)
    val v2 = PretrainExport.refreshTokenizer(spark, refreshed, tokCorpus,
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)
    assert(v2 == 2L, s"refresh committed version $v2")
    // the pinned model is still the version-1 bits
    assert(PretrainExport.pinnedModel(spark, refreshed) == pinnedBefore,
      "refresh moved the pinned model")

    PretrainExport.append(spark, plain, mkDocs(b2))
    PretrainExport.append(spark, refreshed, mkDocs(b2))
    assert(tableRows(plain) == tableRows(refreshed),
      "a tokenizer refresh changed this export's renderings")
  }

  test("double init is refused (params are immutable)") {
    val root = freshRoot("reinit")
    initAt(root)
    val e = intercept[IllegalArgumentException] { initAt(root) }
    assert(e.getMessage.contains("already initialized"))
  }

  test("custom dedup geometry round-trips through the pinned params") {
    // the r11 advice finding: writeParams dropped the dedup field, so
    // append silently ran every probe with DEFAULT band geometry —
    // pin the full round-trip
    val root = freshRoot("geom")
    val custom = PretrainExport.Params(
      windowBudget = 128L, stripeShards = 4L, maxLen = 3,
      dedup = DedupIndex.Params(
        n = 2, k = 16, rowsPerBand = 2, threshold = 0.4, maxBucket = 32))
    PretrainExport.init(spark, root, tokCorpus, p = custom,
      vocabSize = 200, seedSize = 500, emIters = 1, pruneFrac = 0.5)
    val (read, _) = PretrainExport.readParams(spark, root)
    assert(read == custom, s"params did not round-trip: $read")
    // and the appends actually run under that geometry (the DedupIndex
    // root gets pinned on first ingest — a mismatch would throw here)
    PretrainExport.append(spark, root, mkDocs(b1))
    PretrainExport.append(spark, root, mkDocs(b2))
    assert(PretrainExport.shardTable(spark, root).count() > 0)
  }

  test("a torn params pin is refused loudly, not half-parsed") {
    val root = freshRoot("torn")
    initAt(root)
    // simulate the pre-atomic failure mode: truncate the pin mid-token
    // (through the Hadoop FS so the .crc sidecar stays consistent —
    // the point under test is the PARSER, not the checksum layer)
    val pin = new org.apache.hadoop.fs.Path(root, "_graft_export_params")
    val fs = pin.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(pin)
    val full = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    fs.delete(pin, false)
    val out = fs.create(pin, false)
    try out.write(full.take(full.indexOf("tokVersion") + 5).getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      PretrainExport.readParams(spark, root)
    }
    assert(e.getMessage.contains("malformed pin file"))
  }
}
