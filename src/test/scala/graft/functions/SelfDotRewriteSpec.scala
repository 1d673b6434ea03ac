package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The Rule[LogicalPlan] tier: dot_product(x, x) is rewritten to the
  * fused norm2sq kernel, bit-exactly, wherever the rule is installed.
  */
class SelfDotRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0)),
    (2L, Seq(-0.5, 0.25, 4.0))).toDF("id", "v")

  test("self-dot is rewritten to norm2sq in the optimized plan; distinct args are not") {
    // parquet-backed source: a LocalRelation would be eagerly folded by
    // ConvertToLocalRelation and carry no expressions to inspect
    val emb = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val selfDot = emb.select(HashFunctions.dot_product(col("v"), col("v")).as("n2"))
    val opt = selfDot.queryExecution.optimizedPlan.toString
    assert(opt.contains("norm2"), s"expected the fused kernel in the plan:\n$opt")
    assert(!opt.contains("dotexpr("), s"self-dot must be gone:\n$opt")

    val cross = emb.as("a").crossJoin(emb.as("b"))
      .select(HashFunctions.dot_product(col("a.v"), col("b.v")).as("d"))
    val optCross = cross.queryExecution.optimizedPlan.toString
    assert(optCross.contains("dotexpr("), s"distinct-argument dot must survive:\n$optCross")
  }

  test("rewrite is bit-exact AND the fused kernel actually runs: norm2sq == dot(x, x)") {
    // kernel-level parity first (no plan in the way)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1.5, -2.25, 3.125, 0.0, 7.75))
    assert(java.lang.Double.doubleToRawLongBits(HashKernels.norm2sq(arr)) ==
      java.lang.Double.doubleToRawLongBits(HashKernels.dot(arr, arr)))
    // end-to-end over a parquet-backed frame: a LocalRelation would be
    // folded with INTERPRETED DotExpr before extraOptimizations run, so
    // the fused kernel would never evaluate (the ConvertToLocalRelation
    // trap) — assert the plan really contains norm2, then execute it
    val emb = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val q = emb.select(
      col("vec_id"),
      HashFunctions.dot_product(col("v"), col("v")).as("viaRule"),
      expr("aggregate(v, 0D, (acc, x) -> acc + x * x)").as("reference"))
    assert(q.queryExecution.optimizedPlan.toString.contains("norm2"),
      "the collected values below must come from the FUSED kernel")
    q.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"bitwise mismatch at vec ${r.getLong(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }

  test("exactRerank (the production self-dot site) plans with the fused kernel") {
    val emb = (0L until 50L).map(i => (i, Seq.tabulate(8)(j => (i + j).toDouble / 7)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val cand = queries.select("q_id").crossJoin(emb.select("vec_id"))
    val p = graft.ops.PqOps.exactRerank(cand, emb, queries, topk = 3)
      .queryExecution.optimizedPlan.toString
    assert(p.contains("norm2"), s"v·v and q·q must fuse:\n$p")
  }
}
