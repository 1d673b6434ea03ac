package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestSession
import graft.functions.HashKernels

/** Repetition-stats kernel (hand-computed examples, edge cases) and the
  * q_repetition_filter operator (codegen path, SQL registration,
  * non-vacuous keep split on the driver corpus).
  */
class RepetitionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def stats(text: String): Array[Double] = {
    val row = HashKernels.repetitionStats(UTF8String.fromString(text))
    (0 until 6).map(row.getDouble).toArray
  }

  test("hand-computed: 'a b a b c' (9 chars)") {
    val Array(top2, top3, top4, dup2, dup3, dup4) = stats("a b a b c")
    // bigrams: "a b"×2, "b a", "b c" → top "a b" covers 2×3 of 9 chars
    assert(math.abs(top2 - 6.0 / 9) < 1e-12)
    assert(math.abs(dup2 - (1.0 - 3.0 / 4)) < 1e-12)
    // trigrams all unique → tie broken to smallest, "a b a" (5 chars)
    assert(math.abs(top3 - 5.0 / 9) < 1e-12)
    assert(dup3 == 0.0)
    // 4-grams "a b a b" / "b a b c" unique, smallest is "a b a b"
    assert(math.abs(top4 - 7.0 / 9) < 1e-12)
    assert(dup4 == 0.0)
  }

  test("tie-break is lexicographic among equal-count grams") {
    // all bigrams count 1: "x y" < "y z" < "z w"
    val Array(top2, _, _, _, _, _) = stats("x y z w")
    assert(math.abs(top2 - 3.0 / 7) < 1e-12)
  }

  test("degenerate inputs: empty text, single token, all-same token") {
    assert(stats("").forall(_ == 0.0))
    assert(stats("abc").forall(_ == 0.0))
    val Array(top2, _, _, dup2, _, _) = stats("w w w w")
    assert(math.abs(top2 - 3.0 * 3 / 7) < 1e-12) // "w w"×3, 3 chars, text 7
    assert(math.abs(dup2 - (1.0 - 1.0 / 3)) < 1e-12)
  }

  test("supplementary-plane text: lengths count code points, ties break in code-point order") {
    // U+1F600 GRINNING FACE is 2 UTF-16 units but ONE character in
    // DuckDB's length(); text "😀 a 😀 a" = 7 code points
    val Array(top2, _, _, dup2, _, _) = stats("😀 a 😀 a")
    // bigrams: "😀 a"×2 (3 code points), "a 😀"×1 → top covers 2*3/7
    assert(math.abs(top2 - 6.0 / 7) < 1e-12, s"got $top2")
    assert(math.abs(dup2 - (1.0 - 2.0 / 3)) < 1e-12)
  }

  test("SQL registration and codegen path agree with the kernel") {
    val viaSql = spark.sql(
      "SELECT round(repetition_stats('a b a b c').top2_frac, 6) AS f").head().getDouble(0)
    assert(math.abs(viaSql - 6.0 / 9) < 1e-6)
    // through a column over a real frame (whole-stage codegen path)
    val df = spark.range(1).select(
      graft.functions.HashFunctions.repetition_stats(lit("a b a b c")).as("r"))
    assert(math.abs(df.select(col("r.dup2_frac")).head().getDouble(0) - 0.25) < 1e-12)
  }

  test("q_repetition_filter keeps a strict, non-vacuous subset of the corpus") {
    val out = graft.SparkEntry.queries("q_repetition_filter")(spark, sf)
    val n = out.count()
    val kept = out.filter(col("keep")).count()
    assert(n > 0 && kept > 0 && kept < n, s"keep split $kept/$n is vacuous")
  }
}
