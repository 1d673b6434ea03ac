package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the native expressions, so `spark.sql("SELECT
  * simhash64(...)")` works alongside the Column API — via
  * `SparkSessionExtensions` at builder time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`), or
  * [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => SelfDotRewrite)
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("ngram_shingles",
      new ExpressionInfo(classOf[NgramShinglesExpr].getName, "ngram_shingles"),
      args => NgramShinglesExpr(args.head, intArg(args(1), "n"))),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "minhash_sig"),
      args => MinHashSigExpr(args.head, intArg(args(1), "k"))),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      args => SimHash64Expr(args.head)),
    ("md5_simhash_hex",
      new ExpressionInfo(classOf[Md5SimHashExpr].getName, "md5_simhash_hex"),
      args => Md5SimHashExpr(args.head)),
    ("rhp_bucket",
      new ExpressionInfo(classOf[RhpBucketExpr].getName, "rhp_bucket"),
      args => RhpBucketExpr(args.head, intArg(args(1), "nbits"), intArg(args(2), "table"))),
    ("lang_id",
      new ExpressionInfo(classOf[LangIdExpr].getName, "lang_id"),
      args => LangIdExpr(args.head)),
    ("dot_product",
      new ExpressionInfo(classOf[DotExpr].getName, "dot_product"),
      args => DotExpr(args.head, args(1))),
    ("hilbert_index",
      new ExpressionInfo(classOf[HilbertIndexExpr].getName, "hilbert_index"),
      args => HilbertIndexExpr(args.head, args(1), intArg(args(2), "bits"))),
    ("repetition_stats",
      new ExpressionInfo(classOf[RepetitionStatsExpr].getName, "repetition_stats"),
      args => RepetitionStatsExpr(args.head)),
    ("hilbert_index_nd",
      new ExpressionInfo(classOf[HilbertIndexNdExpr].getName, "hilbert_index_nd"),
      args => HilbertIndexNdExpr(args.head, intArg(args(1), "bits"))))

  /** Register on an already-running session (temp functions). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
