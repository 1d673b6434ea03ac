package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[ExportOps]]: equal-size deterministic shards, a manifest that
  * certifies what is on disk, and a verifier that catches corruption.
  */
class ExportOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Long) = spark.range(n).select(
    col("id").as("doc_id"),
    concat(lit("doc-"), col("id")).as("text"),
    pmod(hash(col("id")), lit(100)).cast("long").as("score"))

  test("shards are exactly rowsPerShard (last partial), data round-trips, export is deterministic") {
    val root = graft.TestTmp.dir("shards")
    val m = ExportOps.writeShards(corpus(10500L), s"$root/a", "doc_id", 1000L)
    assert(m.totalRows === 10500L)
    assert(m.shards.map(_.id) === (0L to 10L))
    assert(m.shards.init.forall(_.rows === 1000L), "full shards must be exactly 1000 rows")
    assert(m.shards.last.rows === 500L)
    // one file per shard
    (0L to 10L).foreach { k =>
      val files = new java.io.File(s"$root/a/shard=$k").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files === 1, s"shard $k should be a single file, got $files")
    }
    // round-trip
    val back = spark.read.parquet(s"$root/a")
    assert(back.count() === 10500L)
    assert(back.agg(sum("score")).head().getLong(0) ===
      corpus(10500L).agg(sum("score")).head().getLong(0))
    // shard membership is ordered: shard k holds doc_ids [1000k, 1000k+rows)
    val bounds = back.groupBy(col("shard").cast("long").as("s"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bounds(0L) === (0L, 999L) && bounds(10L) === (10000L, 10499L))
    // re-export reproduces identical checksums (byte-stable membership)
    val m2 = ExportOps.writeShards(corpus(10500L), s"$root/b", "doc_id", 1000L)
    assert(m2.shards === m.shards)
  }

  test("shardManifestQuery: equal shards, contiguous id ranges, partitioning-invariant checksums") {
    val docs = spark.range(200L).select(
      col("id").as("doc_id"),
      concat(lit("body-"), col("id")).as("text"),
      lit("en").as("lang"),
      concat(lit("s"), pmod(col("id"), lit(3))).as("source"),
      (length(concat(lit("body-"), col("id")))).cast("long").as("n_chars"))
    val m = ExportOps.shardManifestQuery(docs, 64L).collect()
    assert(m.map(_.getLong(0)) === Array(0L, 1L, 2L, 3L))
    assert(m.map(_.getLong(1)) === Array(64L, 64L, 64L, 8L))
    // ranges are contiguous and ordered: shard k covers [64k, 64k+rows)
    m.foreach { r =>
      assert(r.getLong(2) === r.getLong(0) * 64L)
      assert(r.getLong(3) === r.getLong(2) + r.getLong(1) - 1)
    }
    // checksums are a pure function of content: a shuffled, repartitioned
    // input produces the identical manifest
    val m2 = ExportOps
      .shardManifestQuery(docs.orderBy(rand(7)).repartition(13), 64L).collect()
    assert(m2.map(_.toSeq) === m.map(_.toSeq))
  }

  test("stripedManifestQuery: near-equal shards, stride witnesses, every shard a systematic sample") {
    val docs = spark.range(100L).select(
      col("id").as("doc_id"),
      concat(lit("body-"), col("id")).as("text"),
      lit("en").as("lang"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("source"),
      length(concat(lit("body-"), col("id"))).cast("long").as("n_chars"))
    val m = ExportOps.stripedManifestQuery(docs, 8L).collect()
    assert(m.map(_.getLong(0)) === (0L to 7L).toArray)
    // 100 rows over 8 stripes: shards 0-3 get 13, shards 4-7 get 12
    assert(m.map(_.getLong(1)) === Array(13L, 13L, 13L, 13L, 12L, 12L, 12L, 12L))
    // stride witnesses: shard k starts at doc k and steps by 8
    m.foreach { r =>
      assert(r.getLong(2) === r.getLong(0))
      assert(r.getLong(3) === r.getLong(2) + (r.getLong(1) - 1) * 8L)
    }
    // systematic striping balances a periodic source column perfectly:
    // every stripe sees each of the 4 sources (period 4 divides stride 8
    // → 2 sources per stripe... so assert the general property instead:
    // each stripe's source set is a fixed residue pattern, never skewed
    // to one source when the period does NOT divide the stride)
    val bySrc = docs.withColumn("shard", pmod(col("doc_id"), lit(8)))
      .groupBy("shard", "source").count()
      .groupBy("shard").count().collect().map(_.getLong(1)).distinct
    assert(bySrc.length === 1, "every stripe must see the same number of sources")
  }

  test("writeEpochShards: distinct deterministic orders per epoch, epoch-invariant content checksum") {
    val root = graft.TestTmp.dir("epochs")
    val docs = corpus(3000L)
    val e0 = ExportOps.writeEpochShards(docs, s"$root/e0", "doc_id", epochSeed = 0L, 500L)
    val e1 = ExportOps.writeEpochShards(docs, s"$root/e1", "doc_id", epochSeed = 1L, 500L)
    val e0again = ExportOps.writeEpochShards(docs, s"$root/e0b", "doc_id", epochSeed = 0L, 500L)

    // same epoch seed => byte-identical manifest (deterministic reshuffle)
    assert(e0again.shards === e0.shards)
    // different seeds => the permutation actually moved: shard
    // membership differs (checksums can't all agree)
    assert(e0.shards.map(_.checksum) !== e1.shards.map(_.checksum))
    // both epochs shard the full corpus into equal blocks
    assert(e0.totalRows === 3000L && e1.totalRows === 3000L)
    assert(e0.shards.forall(_.rows === 500L) && e1.shards.forall(_.rows === 500L))

    // content identity across epochs, from MANIFESTS ALONE: the xor of
    // per-shard checksums telescopes to the whole-corpus row-hash xor,
    // which no permutation can change
    def foldXor(m: ExportOps.ShardManifest) = m.shards.map(_.checksum).reduce(_ ^ _)
    assert(foldXor(e0) === foldXor(e1))
    assert(foldXor(e0) === foldXor(e0again))

    // the shuffle key never reaches the files: schema is the corpus schema
    val back0 = spark.read.parquet(s"$root/e0")
    assert(back0.columns.sorted.toSeq === (docs.columns :+ "shard").sorted.toSeq)
    // an epoch file set round-trips the exact corpus
    assert(back0.drop("shard").orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
    // shard 0 of epoch 0 is NOT a contiguous id block (the point of
    // reshuffling) while remaining deterministic
    val s0 = back0.filter(col("shard") === 0).agg(min("doc_id"), max("doc_id")).head()
    assert(s0.getLong(1) - s0.getLong(0) > 500L, "epoch shard must interleave the id space")
    // both epoch exports verify against their own manifests
    assert(ExportOps.verifyShards(spark, s"$root/e0").filter(!col("checksum_ok")).count() === 0)
    assert(ExportOps.verifyShards(spark, s"$root/e1").filter(!col("checksum_ok")).count() === 0)
  }

  test("resumeFrom: skip-exact replay of a partially consumed epoch, plain and epoch-reshuffled") {
    val root = graft.TestTmp.dir("resume")
    val docs = corpus(530L)

    // plain export: stream order is (shard, doc_id)
    ExportOps.writeShards(docs, s"$root/plain", "doc_id", 100L)
    def streamPlain(s: Long, o: Long) =
      ExportOps.resumeFrom(spark, s"$root/plain", col("doc_id"), s, o)
        .select("shard", "pos", "doc_id").collect().map(_.toString).toSeq
    val fullPlain = streamPlain(0L, 0L)
    assert(fullPlain.size === 530)
    // every checkpoint is skip-exact: resume = the uninterrupted
    // stream minus exactly the consumed prefix
    for ((s, o) <- Seq((0L, 37L), (2L, 0L), (3L, 99L), (5L, 0L))) {
      val consumed = (s * 100L + o).toInt
      assert(streamPlain(s, o) === fullPlain.drop(consumed),
        s"resume at shard=$s offset=$o is not skip-exact")
    }
    // resume past the end is an empty stream, not an error
    assert(streamPlain(5L, 30L).isEmpty)
    assert(streamPlain(6L, 0L).isEmpty)

    // epoch export: the shuffle key was dropped from the files but is
    // recomputable — resume follows the epoch's own order
    ExportOps.writeEpochShards(docs, s"$root/ep7", "doc_id", epochSeed = 7L, 100L)
    def streamEpoch(s: Long, o: Long) =
      ExportOps.resumeFrom(spark, s"$root/ep7", ExportOps.epochKey(7L, "doc_id"), s, o)
        .select("shard", "pos", "doc_id").collect().map(_.toString).toSeq
    val fullEpoch = streamEpoch(0L, 0L)
    assert(fullEpoch.size === 530)
    for ((s, o) <- Seq((0L, 1L), (1L, 50L), (4L, 99L))) {
      val consumed = (s * 100L + o).toInt
      assert(streamEpoch(s, o) === fullEpoch.drop(consumed),
        s"epoch resume at shard=$s offset=$o is not skip-exact")
    }
    // the epoch stream is a permutation of the corpus (content
    // identity), in a genuinely different order than the plain export
    assert(fullEpoch.map(_.split(",").last).toSet ===
      fullPlain.map(_.split(",").last).toSet)
    assert(fullEpoch.map(_.split(",").last) !==
      fullPlain.map(_.split(",").last))
  }

  test("window-granular shard export: rows ARE the token windows, resume is window-exact") {
    // the q_shard_windows composition as FILES: writeShards over
    // packWindows' materialized windows — a training job memory-maps
    // the token arrays, the manifest checksum covers array content
    // (hashExprSql folds the tokens column), and resumeFrom restarts
    // at (shard, window) granularity
    val root = graft.TestTmp.dir("winshards")
    val docs = spark.range(200L).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 to 16).map(i => concat(lit(s"w$i"), col("id"))): _*).as("text"))
    val wins = PackOps.packWindows(docs, budget = 32L)
    val nWins = wins.count()
    assert(nWins === (200L * 17L + 31L) / 32L)
    val m = ExportOps.writeShards(wins, s"$root/w", "window_id", 20L)
    assert(m.totalRows === nWins)
    // round-trip: every window's token array survives the files intact
    val back = spark.read.parquet(s"$root/w")
    val origText = wins.select(col("window_id"), concat_ws(" ", col("tokens")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    back.select(col("window_id"), concat_ws(" ", col("tokens")).as("t"))
      .collect().foreach(r => assert(origText(r.getLong(0)) === r.getString(1)))
    assert(ExportOps.verifyShards(spark, s"$root/w")
      .filter(!col("checksum_ok")).count() === 0)
    // window-granular skip-exact resume
    def stream(s: Long, o: Long) =
      ExportOps.resumeFrom(spark, s"$root/w", col("window_id"), s, o)
        .select(col("shard"), col("pos"), col("window_id"),
          concat_ws(" ", col("tokens")))
        .collect().map(_.toString).toSeq
    val full = stream(0L, 0L)
    assert(full.size === nWins)
    for ((s, o) <- Seq((0L, 7L), (1L, 0L), (2L, 19L))) {
      val consumed = (s * 20L + o).toInt
      assert(stream(s, o) === full.drop(consumed),
        s"window resume at shard=$s offset=$o is not skip-exact")
    }
  }

  test("verifyShards passes on intact shards and fails on tampering") {
    val root = graft.TestTmp.dir("shards2")
    ExportOps.writeShards(corpus(3000L), s"$root/t", "doc_id", 1000L)
    val ok = ExportOps.verifyShards(spark, s"$root/t")
    assert(ok.count() === 3)
    assert(ok.filter(!col("checksum_ok")).count() === 0)

    // tamper: drop shard 1's data file entirely (a truncated volume)
    new java.io.File(s"$root/t/shard=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    val bad = ExportOps.verifyShards(spark, s"$root/t")
    val verdicts = bad.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts(0L) && verdicts(2L), "untouched shards still verify")
    assert(!verdicts(1L), "the gutted shard must fail verification")
  }
}
