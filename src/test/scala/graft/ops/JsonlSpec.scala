package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[JsonlOps]]: the JSONL corpus source/sink — file round-trip
  * fidelity (including hostile text), corrupt-line quarantine, and the
  * no-silent-loss accounting contract.
  */
class JsonlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val hostile = Seq(
    (1L, "en", "web", "plain words"),
    (2L, "en", "web", """quotes " and \ backslashes \n literal"""),
    (3L, "de", "books", "newline\nand\ttab inside"),
    (4L, "ja", "web", "unicode: 日本語 ☃ emoji 😀"),
    (5L, "en", "web", "{\"looks\":\"like json\"}"),
    (6L, "en", "web", ""))

  test("JSONL file round-trip is lossless, including hostile text") {
    val dir = graft.TestTmp.dir("jsonl")
    val docs = hostile.toDF("doc_id", "lang", "source", "text")
    JsonlOps.writeJsonl(docs, s"$dir/out")
    val back = JsonlOps.readJsonl(spark, s"$dir/out")
    assert(back.filter(col("_corrupt").isNotNull).count() === 0)
    assert(back.drop("_corrupt").orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
    // every file line is one JSON document (the format contract)
    assert(spark.read.text(s"$dir/out").count() === hostile.size.toLong)
  }

  test("corrupt lines are quarantined with the original bytes, never silently dropped") {
    val dir = graft.TestTmp.dir("jsonl2")
    JsonlOps.writeJsonl(hostile.take(3).toDF("doc_id", "lang", "source", "text"), s"$dir/c")
    // plant malformed lines alongside the good files
    Files.writeString(java.nio.file.Paths.get(s"$dir/c/part-corrupt.txt"),
      "not json at all\n{\"doc_id\": 99, \"lang\": \"en\", \"text\" BROKEN}\n")
    val back = JsonlOps.readJsonl(spark, s"$dir/c")
    val good = back.filter(col("_corrupt").isNull)
    val bad = back.filter(col("_corrupt").isNotNull)
    assert(good.count() === 3, "intact lines all parse")
    assert(bad.count() === 2, "both malformed lines quarantined")
    // the quarantine carries the raw line for forensics/replay
    assert(bad.select("_corrupt").as[String].collect().toSet ===
      Set("not json at all", "{\"doc_id\": 99, \"lang\": \"en\", \"text\" BROKEN}"))
    // accounting: good + quarantined == file lines (nothing vanishes)
    assert(good.count() + bad.count() === spark.read.text(s"$dir/c").count())
  }
}
