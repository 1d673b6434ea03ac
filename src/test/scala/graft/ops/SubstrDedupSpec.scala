package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Planted-corpus proof of the exact-substring dedup operator: the
  * windowed-hash construction must return EXACTLY the spans a suffix
  * array would (the shared block and nothing else — boundary windows
  * that straddle unique context must not leak in), the production
  * xxhash64 keys must agree with the md5 oracle keys, and the scrub
  * action must excise precisely the spans.
  */
class SubstrDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val L = 40
  // independent seeded segments — no accidental window repeats inside
  // or across them (alphanumeric, 62^40 window space)
  private def seg(seed: Int, n: Int): String =
    new scala.util.Random(seed).alphanumeric.take(n).mkString

  private val shared = seg(1, 80)  // the planted duplicated block
  private val preA = seg(2, 50); private val sufA = seg(3, 50)
  private val preB = seg(4, 60); private val sufB = seg(5, 30)
  private val unique = seg(6, 120) // doc C/D body (C = D exactly)
  private val short = seg(7, 39)   // below L: must be ignored entirely

  private def docs = Seq(
    (0L, preA + shared + sufA),
    (1L, preB + shared + sufB),
    (2L, unique),
    (3L, unique),
    (4L, short)).toDF("doc_id", "text")

  test("spans are exactly the planted shared block / full copy — no boundary leakage") {
    val spans = SubstrDedupOps.duplicatedSpans(docs, minLen = L)
      .orderBy("doc_id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq(
      // only windows FULLY inside the shared block recur, so the merged
      // span is the block itself at each doc's own offset
      (0L, preA.length + 1L, preA.length + shared.length.toLong),
      (1L, preB.length + 1L, preB.length + shared.length.toLong),
      // C and D duplicate each other end to end
      (2L, 1L, unique.length.toLong),
      (3L, 1L, unique.length.toLong)))
  }

  test("rolling-kernel production keys match the md5 and xxhash64 key choices") {
    val defSpans = SubstrDedupOps.duplicatedSpans(docs, minLen = L)
    val md5Spans = SubstrDedupOps.duplicatedSpans(docs, minLen = L, hash = Some(c => md5(c)))
    val xxSpans = SubstrDedupOps.duplicatedSpans(docs, minLen = L, hash = Some(c => xxhash64(c)))
    assert(defSpans.exceptAll(md5Spans).isEmpty && md5Spans.exceptAll(defSpans).isEmpty)
    assert(defSpans.exceptAll(xxSpans).isEmpty && xxSpans.exceptAll(defSpans).isEmpty)
  }

  test("multi-byte text: rolling-kernel positions count code points like substr") {
    // 2-byte (é) and 3-byte (日) chars around and inside the shared
    // block — the kernel must agree with the substr-enumeration path,
    // whose positions are code-point-based by construction
    val sharedU = "é日" + seg(20, 36) + "βγ"
    val docsU = Seq(
      (0L, "αα" + seg(21, 48) + sharedU + seg(22, 50)),
      (1L, seg(23, 61) + sharedU + "日" + seg(24, 29))).toDF("doc_id", "text")
    val ker = SubstrDedupOps.duplicatedSpans(docsU, minLen = L)
    val sub = SubstrDedupOps.duplicatedSpans(docsU, minLen = L, hash = Some(c => md5(c)))
    assert(ker.exceptAll(sub).isEmpty && sub.exceptAll(ker).isEmpty)
    val spans = ker.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq(
      (0L, 51L, 50L + sharedU.length),
      (1L, 62L, 61L + sharedU.length)))
    // scrub splices at those code-point offsets correctly too
    val cleaned = SubstrDedupOps.scrubSpans(docsU, ker)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(0L) == "αα" + seg(21, 48) + seg(22, 50))
    assert(cleaned(1L) == seg(23, 61) + "日" + seg(24, 29))
  }

  test("scrubSpans excises exactly the spans; span-free docs pass through") {
    val cleaned = SubstrDedupOps
      .scrubSpans(docs, SubstrDedupOps.duplicatedSpans(docs, minLen = L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cleaned(0L) == preA + sufA, "shared block cut, unique context kept")
    assert(cleaned(1L) == preB + sufB)
    assert(cleaned(2L) == "" && cleaned(3L) == "", "full-copy docs scrub to empty")
    assert(cleaned(4L) == short, "sub-L doc untouched (left join null branch)")
  }

  test("adjacent duplicated windows merge into one contiguous span") {
    // two shared blocks placed back-to-back in one pair of docs: their
    // window coverage is contiguous, so ONE span must come back
    val s2 = seg(8, 60)
    val two = Seq(
      (10L, seg(9, 45) + shared + s2 + seg(10, 45)),
      (11L, seg(11, 55) + shared + s2 + seg(12, 35))).toDF("doc_id", "text")
    val spans = SubstrDedupOps.duplicatedSpans(two, minLen = L)
      .filter(col("doc_id") === 10L).collect()
    assert(spans.length == 1)
    assert(spans(0).getLong(1) == 46L && spans(0).getLong(2) == (45 + shared.length + s2.length).toLong)
  }
}
