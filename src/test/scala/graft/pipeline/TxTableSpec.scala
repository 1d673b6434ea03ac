package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Crash-safety of the manifest-log table: a commit that dies between
  * partition writes and the manifest publish must be invisible — readers
  * keep seeing the previous version of EVERY partition, never a torn mix.
  */
class TxTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows(pairs: (String, Double)*) =
    pairs.toSeq.toDF("day", "value")

  private def snapshot(root: String): Set[(String, Double)] =
    TxTable.read(spark, root)
      .select(col("day").cast("string"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet

  test("kill between partition swaps: staged-but-unpublished commit is invisible; publish flips all partitions atomically") {
    val root = graft.TestTmp.dir("txtable") + "/gold"
    // v1: days A, B
    TxTable.commit(spark, root, rows("2022-04-14" -> 1.0, "2022-04-15" -> 2.0), "day")
    assert(snapshot(root) == Set("2022-04-14" -> 1.0, "2022-04-15" -> 2.0))

    // crash simulation: a merge recomputing day A and adding day C stages
    // its partitions (the multi-partition "swap" of the old design) but
    // dies before the manifest publish
    val staged = TxTable.stage(spark, root,
      rows("2022-04-14" -> 10.0, "2022-04-16" -> 3.0), "day")
    assert(snapshot(root) == Set("2022-04-14" -> 1.0, "2022-04-15" -> 2.0),
      "reader must not see any staged partition — old A AND old B, no torn mix")

    // recovery = just publish (or abandon) the staged version
    TxTable.publish(spark, root, staged, "day")
    assert(snapshot(root) == Set("2022-04-14" -> 10.0, "2022-04-15" -> 2.0, "2022-04-16" -> 3.0),
      "after the single manifest rename: new A, untouched B, new C")
  }

  test("crash during manifest write: .tmp debris is ignored by readers and cleaned by vacuum") {
    val root = graft.TestTmp.dir("txtable2") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0), "day")
    // simulate a publish that died mid-manifest-write
    Files.createDirectories(java.nio.file.Paths.get(s"$root/_txlog"))
    val tmp = java.nio.file.Paths.get(s"$root/_txlog/00000002.manifest.tmp")
    Files.writeString(tmp, "d1\tv2/day=d1")
    assert(snapshot(root) == Set("d1" -> 1.0), "partial manifest must be invisible")
    // a tmp at least as new as the latest manifest gets the same
    // modification-time grace as data dirs (it may be a LIVE concurrent
    // casManifest between create and link) — one vacuum leaves it alone
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    assert(new java.io.File(tmp.toString).exists(),
      "fresh tmp survives vacuum — it is indistinguishable from an in-flight publish")
    assert(snapshot(root) == Set("d1" -> 1.0))
    // after the NEXT successful commit the tmp is provably debris
    // (strictly older than the new latest manifest) and is collected
    TxTable.commit(spark, root, rows("d2" -> 2.0), "day")
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    assert(!new java.io.File(tmp.toString).exists(),
      "tmp older than the latest manifest is crash debris — collected")
    assert(snapshot(root) == Set("d1" -> 1.0, "d2" -> 2.0))
  }

  test("vacuum drops superseded versions but keeps every partition the latest manifest references") {
    val root = graft.TestTmp.dir("txtable3") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day")
    TxTable.commit(spark, root, rows("d1" -> 10.0), "day") // v2 rewrites only d1
    TxTable.commit(spark, root, rows("d1" -> 100.0), "day") // v3 rewrites only d1
    assert(snapshot(root) == Set("d1" -> 100.0, "d2" -> 2.0))
    def versionDirs() =
      new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v")).toSet
    assert(versionDirs().size == 3, "three commits -> three version dirs")
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    // v2's dir (fully superseded) is gone; v1's survives because d2
    // still lives there, v3's is the live d1
    val live = versionDirs()
    assert(live.size == 2, s"unreferenced version dir removed, kept $live")
    assert(live.exists(_.startsWith("v1-")) && live.exists(_.startsWith("v3-")), s"$live")
    assert(snapshot(root) == Set("d1" -> 100.0, "d2" -> 2.0), "read identical after vacuum")
  }

  test("time travel: readAt returns each past version exactly; vacuum bounds the horizon") {
    val root = graft.TestTmp.dir("txtable5") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day")
    TxTable.commit(spark, root, rows("d1" -> 10.0), "day")
    def at(v: Long) = TxTable.readAt(spark, root, v)
      .select(col("day").cast("string"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(at(1) == Set("d1" -> 1.0, "d2" -> 2.0), "v1 frozen")
    assert(at(2) == Set("d1" -> 10.0, "d2" -> 2.0), "v2 = latest")
    intercept[IllegalArgumentException](TxTable.readAt(spark, root, 3))
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    // superseded manifest removed -> v1 no longer travelable, v2 intact
    intercept[IllegalArgumentException](TxTable.readAt(spark, root, 1))
    assert(at(2) == Set("d1" -> 10.0, "d2" -> 2.0))
  }

  test("vacuum retention: a reader pinned to a superseded manifest keeps its files inside the horizon") {
    val root = graft.TestTmp.dir("txtable_ret") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0), "day") // v1
    // a long scan pins v1 BEFORE the writer supersedes it
    val pinned = TxTable.readAt(spark, root, 1)
      .select(col("day").cast("string"), col("value"))
    TxTable.commit(spark, root, rows("d1" -> 10.0), "day") // v2 fully supersedes v1's dir
    def versionDirs() =
      new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v")).toSet

    // default-retention vacuum runs between the reader's pin and its
    // collect — the exact race the contract exists for
    TxTable.vacuum(spark, root)
    assert(versionDirs().exists(_.startsWith("v1-")),
      "v1 superseded moments ago is inside the retention horizon — its dir must survive")
    assert(pinned.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set("d1" -> 1.0), "the pinned reader completes against the retained files")
    // the superseded manifest is retained too, so a fresh time-travel
    // to v1 inside the horizon still works
    assert(TxTable.readAt(spark, root, 1).count() === 1L)

    // past the horizon (simulated with retainMs = 0) the contract ends:
    // v1's dir and manifest are collected, readers must re-pin
    TxTable.vacuum(spark, root, retainMs = 0L)
    assert(!versionDirs().exists(_.startsWith("v1-")), "past the horizon v1 is collected")
    intercept[IllegalArgumentException](TxTable.readAt(spark, root, 1))
    assert(snapshot(root) == Set("d1" -> 10.0), "latest is untouched throughout")
  }

  test("vacuum running concurrently with a commit never deletes the in-flight staged dir") {
    val root = graft.TestTmp.dir("txtable6") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0), "day")
    // a second writer has staged v2 but not yet published when vacuum runs
    val staged = TxTable.stage(spark, root, rows("d1" -> 2.0), "day")
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    assert(new java.io.File(s"$root/$staged").exists(),
      "staged-not-yet-published dir (newer than the latest manifest) must survive vacuum")
    TxTable.publish(spark, root, staged, "day")
    assert(snapshot(root) == Set("d1" -> 2.0), "the raced commit still completes intact")
  }

  test("schema evolution: a commit adding a column reads back with nulls on old partitions") {
    val root = graft.TestTmp.dir("txtable7") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day")
    // v2 rewrites d1 only, with a NEW source column
    TxTable.commit(spark, root,
      rows("d1" -> 10.0).withColumn("source", lit("late-feed")), "day")
    val got = TxTable.read(spark, root)
      .select(col("day").cast("string"), col("value"), col("source"))
      .collect().map(r => (r.getString(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      ("d1", 10.0, Some("late-feed")),
      ("d2", 2.0, None)),
      "new column present, old partition reads null — no rewrite of untouched partitions")
    // time travel still shows the ORIGINAL schema
    assert(!TxTable.readAt(spark, root, 1).columns.contains("source"))
  }

  test("type widening: an int column promoted to long (and to double) still reads old partitions") {
    val root = graft.TestTmp.dir("txtable8") + "/t"
    TxTable.commit(spark, root,
      Seq(("d1", 1), ("d2", 2)).toDF("day", "n"), "day") // n: int
    TxTable.commit(spark, root,
      Seq(("d1", 10L)).toDF("day", "n"), "day") // n: long — v1's d2 must widen
    val got = TxTable.read(spark, root)
      .select(col("day").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set("d1" -> 10L, "d2" -> 2L))
    // int×float mix widens to DOUBLE (a long can't live in a float)
    TxTable.commit(spark, root, Seq(("d2", 2.5f)).toDF("day", "n"), "day")
    val df = TxTable.read(spark, root)
    assert(df.schema("n").dataType == org.apache.spark.sql.types.DoubleType)
    assert(df.select(col("day").cast("string"), col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet == Set("d1" -> 10.0, "d2" -> 2.5))
    // a non-numeric conflict is DEFERRED to unionByName's standard
    // set-operation coercion — custom widening must never change what
    // Spark-standard reads do. Spark coerces string∪double to DOUBLE at
    // analysis and the ANSI cast then rejects malformed values at
    // runtime with a clear CAST_INVALID_INPUT naming the value.
    TxTable.commit(spark, root, Seq(("d1", "oops")).toDF("day", "n"), "day")
    val coerced = TxTable.read(spark, root)
    assert(coerced.schema("n").dataType == org.apache.spark.sql.types.DoubleType)
    val ex = intercept[Exception](coerced.collect())
    assert(ex.getMessage.contains("CAST_INVALID_INPUT"), ex.getMessage.take(200))
  }

  test("compactAll rewrites every live partition into one version; vacuum then drops the rest") {
    val root = graft.TestTmp.dir("txtable9") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day")
    TxTable.commit(spark, root, rows("d1" -> 10.0), "day")
    TxTable.commit(spark, root, rows("d3" -> 3.0), "day")
    val before = snapshot(root)
    TxTable.compactAll(spark, root, "day")
    assert(snapshot(root) == before, "compaction must not change table contents")
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    val live = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v")).toSet
    assert(live.size == 1, s"after compact+vacuum exactly ONE version dir survives: $live")
    assert(snapshot(root) == before, "read identical after vacuum")
  }

  test("optimistic concurrency: disjoint-partition writers both commit; same-partition conflict throws") {
    val root = graft.TestTmp.dir("graft-txocc") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day") // v1

    // A reads at v1 and stages d1; B commits d2 first; A must REBASE
    // cleanly (disjoint partitions) and land at v3 with BOTH updates
    val baseA = TxTable.latest(spark, root)._1
    val stagedA = TxTable.stage(spark, root, rows("d1" -> 10.0), "day")
    val vB = TxTable.commitOptimistic(spark, root, rows("d2" -> 20.0), "day")
    assert(vB == 2L)
    val vA = TxTable.publishOptimistic(spark, root, stagedA, "day", baseA)
    assert(vA == 3L)
    assert(snapshot(root) == Set(("d1", 10.0), ("d2", 20.0)))

    // C reads at v3 and stages d2; D commits d2 in between: C's publish
    // must fail with a write-write conflict, and the table keeps D's row
    val baseC = TxTable.latest(spark, root)._1
    val stagedC = TxTable.stage(spark, root, rows("d2" -> 99.0), "day")
    TxTable.commitOptimistic(spark, root, rows("d2" -> 21.0), "day")
    val conflict = intercept[TxTable.WriteConflictException] {
      TxTable.publishOptimistic(spark, root, stagedC, "day", baseC)
    }
    assert(conflict.getMessage.contains("d2"))
    assert(snapshot(root) == Set(("d1", 10.0), ("d2", 21.0)))

    // the failed commit left only invisible debris; vacuum collects it
    // and a subsequent rebased retry (fresh base) succeeds
    val retry = TxTable.commitOptimistic(spark, root, rows("d2" -> 99.0), "day")
    assert(retry == 5L)
    assert(snapshot(root) == Set(("d1", 10.0), ("d2", 99.0)))
  }

  test("appendCommit: O(increment) — existing partition dirs carry over verbatim, new rows union in") {
    val root = graft.TestTmp.dir("txappend") + "/t"
    val v1 = TxTable.appendCommit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day")
    assert(v1 == 1L)
    val before = TxTable.latest(spark, root)._2
    val v2 = TxTable.appendCommit(spark, root, rows("d1" -> 10.0, "d3" -> 3.0), "day")
    assert(v2 == 2L)
    assert(snapshot(root) == Set("d1" -> 1.0, "d1" -> 10.0, "d2" -> 2.0, "d3" -> 3.0))
    val after = TxTable.latest(spark, root)._2
    assert(after("d2") == before("d2"), "untouched partition: same entry")
    assert(after("d1").startsWith(before("d1") + "\t"),
      s"appended partition keeps its old dir first and GROWS: ${after("d1")}")
    assert(after("d1").split("\t").length == 2)
    // an overwrite-commit afterwards collapses the dir list again
    TxTable.commit(spark, root, rows("d1" -> 99.0), "day")
    assert(snapshot(root) == Set("d1" -> 99.0, "d2" -> 2.0, "d3" -> 3.0))
    assert(!TxTable.latest(spark, root)._2("d1").contains("\t"))
  }

  test("blind appends never conflict: two appenders to the SAME partition both land (the Delta append rule)") {
    val root = graft.TestTmp.dir("txappend2") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0), "day")
    // both stage before either publishes — maximal race
    val sA = TxTable.stage(spark, root, rows("d1" -> 2.0), "day")
    val sB = TxTable.stage(spark, root, rows("d1" -> 3.0), "day")
    val vA = TxTable.appendPublish(spark, root, sA, "day")
    val vB = TxTable.appendPublish(spark, root, sB, "day")
    assert(Set(vA, vB) == Set(2L, 3L))
    assert(snapshot(root) == Set("d1" -> 1.0, "d1" -> 2.0, "d1" -> 3.0),
      "no lost append: all three rows visible")
    // vacuum keeps every dir a multi-dir entry references
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    assert(snapshot(root) == Set("d1" -> 1.0, "d1" -> 2.0, "d1" -> 3.0))
    // and deleteWhere still rewrites the fragmented partition correctly
    assert(TxTable.deleteWhere(spark, root, "day", col("value") === 2.0) == 1L)
    assert(snapshot(root) == Set("d1" -> 1.0, "d1" -> 3.0))
    assert(!TxTable.latest(spark, root)._2("d1").contains("\t"),
      "delete's rewrite collapses the dir list")
  }

  test("history reports every travelable version with its fragmentation") {
    val root = graft.TestTmp.dir("txhist") + "/t"
    assert(TxTable.history(spark, root).isEmpty)
    TxTable.commit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day")
    TxTable.appendCommit(spark, root, rows("d1" -> 3.0), "day")
    TxTable.appendCommit(spark, root, rows("d1" -> 4.0), "day")
    val h = TxTable.history(spark, root)
    assert(h.map(_._1) == Seq(1L, 2L, 3L))
    assert(h.map(x => (x._3, x._4)) == Seq((2, 2), (2, 3), (2, 4)),
      s"partition/dir counts must show the append fragmentation: $h")
    TxTable.compactAll(spark, root, "day")
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    val h2 = TxTable.history(spark, root)
    assert(h2.map(_._1) == Seq(4L), "vacuum drops superseded versions from history")
    assert(h2.head._3 == 2 && h2.head._4 == 2, "compaction collapses dirs to one per partition")
  }

  test("appends compact away: compactAll collapses accumulated append dirs into one") {
    val root = graft.TestTmp.dir("txappend3") + "/t"
    TxTable.appendCommit(spark, root, rows("d1" -> 1.0), "day")
    TxTable.appendCommit(spark, root, rows("d1" -> 2.0), "day")
    TxTable.appendCommit(spark, root, rows("d1" -> 3.0), "day")
    val frag = TxTable.latest(spark, root)._2("d1")
    assert(frag.split("\t").length == 3, s"three appends -> three dirs: $frag")
    TxTable.compactAll(spark, root, "day")
    TxTable.vacuum(spark, root, retainMs = 0L) // eager mode: no reader grace
    assert(!TxTable.latest(spark, root)._2("d1").contains("\t"))
    assert(snapshot(root) == Set("d1" -> 1.0, "d1" -> 2.0, "d1" -> 3.0))
    val live = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("v")).toSet
    assert(live.size == 1, s"one version dir after compact+vacuum: $live")
  }

  test("deleteWhere: partial-partition rewrite, full-partition drop, untouched files shared, audit trail") {
    val root = graft.TestTmp.dir("txdel") + "/t"
    TxTable.commit(spark, root,
      rows("d1" -> 1.0, "d1" -> 2.0, "d2" -> 3.0, "d3" -> 4.0), "day")
    val before = TxTable.latest(spark, root)._2

    // delete one row of d1 and ALL of d2 in one takedown
    val n = TxTable.deleteWhere(spark, root, "day",
      col("value") === 2.0 || col("day") === "d2")
    assert(n == 2L)
    assert(snapshot(root) == Set("d1" -> 1.0, "d3" -> 4.0))
    val after = TxTable.latest(spark, root)._2
    assert(after("d3") == before("d3"), "untouched partition keeps its original files")
    assert(!after.contains("d2"), "fully-deleted partition leaves the manifest")
    assert(after("d1") != before("d1"), "matched partition rewritten into a new version dir")

    // the pre-delete state stays travelable until vacuum — the audit trail
    assert(TxTable.readAt(spark, root, 1)
      .select(col("day").cast("string"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set("d1" -> 1.0, "d1" -> 2.0, "d2" -> 3.0, "d3" -> 4.0))

    // no-match delete: 0 rows, NO new version published
    val v = TxTable.latest(spark, root)._1
    assert(TxTable.deleteWhere(spark, root, "day", col("value") === 99.0) == 0L)
    assert(TxTable.latest(spark, root)._1 == v)

    // NULL predicate rows are KEPT (SQL DELETE three-valued semantics):
    // when() without otherwise() is NULL off the matched branch
    val n2 = TxTable.deleteWhere(spark, root, "day",
      when(col("value") === 1.0, lit(true)))
    assert(n2 == 1L)
    assert(snapshot(root) == Set("d3" -> 4.0))

    // deleting every remaining row refuses loudly
    intercept[IllegalArgumentException](
      TxTable.deleteWhere(spark, root, "day", lit(true)))
    assert(snapshot(root) == Set("d3" -> 4.0), "refused delete changes nothing")
  }

  test("deleteWhere: nondeterministic predicate refused — it would delete a different set than it counts") {
    val root = graft.TestTmp.dir("txdelnd") + "/t"
    TxTable.commit(spark, root, rows("d1" -> 1.0, "d2" -> 2.0), "day")
    val ex = intercept[IllegalArgumentException](
      TxTable.deleteWhere(spark, root, "day", rand() < 0.5))
    assert(ex.getMessage.contains("deterministic"))
    // expr-string form resolves to the same Nondeterministic node
    intercept[IllegalArgumentException](
      TxTable.deleteWhere(spark, root, "day", expr("rand() < 0.5")))
    assert(snapshot(root) == Set("d1" -> 1.0, "d2" -> 2.0), "refused delete changes nothing")
  }

  test("deleteWhere: partition values the writer escapes (':' in dir names) address the right manifest keys") {
    val root = graft.TestTmp.dir("txdelesc") + "/t"
    // ':' is illegal in a Hadoop path segment — partitionBy writes day=a%3Ab;
    // the manifest key is that ESCAPED form, while rows hold the raw value
    TxTable.commit(spark, root, rows("a:b" -> 1.0, "a:b" -> 2.0, "plain" -> 3.0), "day")
    val before = TxTable.latest(spark, root)._2
    assert(before.contains("a%3Ab"), s"writer-escaped manifest key expected: $before")
    val n = TxTable.deleteWhere(spark, root, "day", col("value") === 1.0)
    assert(n == 1L)
    assert(snapshot(root) == Set("a:b" -> 2.0, "plain" -> 3.0))
    val after = TxTable.latest(spark, root)._2
    assert(after("plain") == before("plain"), "untouched partition keeps its files")
    assert(after("a%3Ab") != before("a%3Ab"), "escaped-key partition rewritten, not duplicated")
    // deleting the remaining a:b row drops the escaped key entirely
    assert(TxTable.deleteWhere(spark, root, "day", col("day") === "a:b") == 1L)
    assert(!TxTable.latest(spark, root)._2.contains("a%3Ab"))
    assert(snapshot(root) == Set("plain" -> 3.0))
  }

  test("deleteWhere: rows with a NULL partition value are refused, not silently mis-addressed") {
    val root = graft.TestTmp.dir("txdelnull") + "/t"
    val data = Seq((Some("d1"), 1.0), (None, 2.0)).toDF("day", "value")
    TxTable.commit(spark, root, data, "day")
    val ex = intercept[IllegalArgumentException](
      TxTable.deleteWhere(spark, root, "day", col("value") === 2.0))
    assert(ex.getMessage.contains("NULL"))
    // a delete touching only NON-null partitions still works on this table
    assert(TxTable.deleteWhere(spark, root, "day", col("value") === 1.0) == 1L)
  }

  test("the gold merge path composes with TxTable: incremental day recompute commits atomically") {
    val root = graft.TestTmp.dir("txtable4") + "/gold"
    // initial gold: two days
    val g1 = rows("2022-04-14" -> 17.485, "2022-04-15" -> 20.0)
      .withColumn("day", col("day").cast("date"))
    TxTable.commit(spark, root, g1, "day")
    // late data recomputes day 14 only: full new content of that day
    val g2 = rows("2022-04-14" -> 18.0).withColumn("day", col("day").cast("date"))
    TxTable.commit(spark, root, g2, "day")
    val got = TxTable.read(spark, root)
      .select(col("day").cast("string"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(got == Set("2022-04-14" -> 18.0, "2022-04-15" -> 20.0))
  }
}
