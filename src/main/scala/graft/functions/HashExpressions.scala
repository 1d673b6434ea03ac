package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hash-sketch hot paths.
  *
  * The column-HOF formulations (k × `transform`+`array_min` passes for
  * MinHash, 64 × `aggregate` passes for SimHash) are interpreted
  * per-element lambdas — measured ~10s for 5k docs at sf0.1. These
  * expressions do the same math in one tight JVM loop per row
  * ([[HashKernels]]), and participate in whole-stage codegen via
  * `doGenCode` (the generated code calls the kernel directly — no boxed
  * interpreted-eval dispatch, surrounding operators stay fused).
  */
trait KernelCodegen { self: UnaryExpression =>
  /** Java expression for the kernel call, given the child variable. */
  protected def kernelCall(ctx: CodegenContext, childVar: String): String

  protected def kernelGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => kernelCall(ctx, c))

  /** Static call target: scalac emits static forwarders for the
    * standalone `HashKernels` object, so generated code calls the class
    * directly — nothing to serialize into the plan.
    */
  protected final val kernels: String = "graft.functions.HashKernels"
}

/** Word n-gram shingles straight from the text column: split on single
  * space, join each n consecutive tokens. Fewer than n tokens → one
  * shingle of all tokens (matches the HOF/`split` semantics).
  */
final case class NgramShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.ngramShingles(input.asInstanceOf[UTF8String], n)

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.ngramShingles($c, $n)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature (Broder '97): per permutation j < k, min over
  * shingles of XXH64(shingle, seed=j). One pass over the array, k mins
  * updated in place.
  */
final case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.minhashSig($c, $k)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash (Charikar '02): per bit, majority vote of shingle-hash
  * bits; one pass, 64 counters.
  */
final case class SimHash64Expr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashKernels.simhash64(input.asInstanceOf[ArrayData]))

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.simhash64($c)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Karp-Rabin polynomial rolling hash of a string (mod 2^31-1, base 31,
  * over code points) — the classic document-fingerprinting kernel.
  */
final case class RollingHashExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashKernels.rollingHash(input.asInstanceOf[UTF8String]))

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.rollingHash($c)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All overlapping `minLen`-code-point window rolling hashes of a
  * string (Karp–Rabin mod 2^61-1, [[HashKernels.windowHashes]]) —
  * array<long>, one element per 1-based window start. Exists for
  * ExactSubstr dedup: O(n) total hash work where the per-position
  * `xxhash64(substr(...))` enumeration costs O(n·minLen) plus a
  * substring copy per window.
  */
final case class WindowHashesExpr(child: Expression, minLen: Int)
    extends UnaryExpression with KernelCodegen {
  require(minLen >= 1, s"window_hashes minLen must be >= 1, got $minLen")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.windowHashes(input.asInstanceOf[UTF8String], minLen)

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.windowHashes($c, $minLen)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket (Charikar '02) over an array<double>
  * embedding: nbits sign-bits of dot products with deterministic
  * pseudo-random hyperplanes (component for (bit,dim) derived from
  * XXH64(dim, seed=globalBit), uniform in [-1,1)).
  */
final case class RhpBucketExpr(child: Expression, nbits: Int, table: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashKernels.rhpBucket(input.asInstanceOf[ArrayData], nbits, table))

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.rhpBucket($c, $nbits, $table)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5-based MinHash signature (array<string> of 16-hex-char mins),
  * byte-identical to the SQL md5 formulation — the oracle-checkable
  * variant of MinHashSigExpr.
  */
final case class Md5MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.md5MinhashSig(input.asInstanceOf[ArrayData], k)

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.md5MinhashSig($c, $k)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5-based SimHash as a 16-hex-char string — oracle twin of
  * [[SimHash64Expr]] (see [[HashKernels.md5SimhashHex]]).
  */
final case class Md5SimHashExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.md5SimhashHex(input.asInstanceOf[ArrayData])

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.md5SimhashHex($c)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing window-min fingerprint (min md5-prefix over all
  * `window`-char substrings); null when text is shorter than the window.
  * NOT null-intolerant on output — returns null for short texts — but
  * null input still yields null via UnaryExpression's default.
  */
final case class WinnowMinExpr(child: Expression, window: Int)
    extends UnaryExpression with KernelCodegen {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.winnowMin(input.asInstanceOf[UTF8String], window)

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.winnowMin($c, $window)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel may return null for short texts: generated code must
    // null-check the result, so use nullSafeCodeGen with an explicit
    // isNull update rather than defineCodeGen
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $kernels.winnowMin($c, $window);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of two array<double> columns: sequential fold, same
  * summation order as the HOF form and DuckDB's list_dot_product (so
  * results stay bit-identical for the oracle), ~5× less per-pair
  * overhead than zip_with+aggregate interpreted lambdas.
  */
final case class DotExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  // explicit type check: a wrong-typed SQL call (dot_product is
  // SQL-registered) becomes an analysis error, not a codegen
  // ClassCastException mid-job (AbstractDataType is private[sql], so
  // ExpectsInputTypes isn't implementable from here)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val want = ArrayType(DoubleType)
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product expects ($want, $want), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(
      HashKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 norm — the target of [[SelfDotRewrite]]'s
  * `dot_product(x, x)` rewrite. Same sequential accumulation order as
  * [[DotExpr]], so the rewrite never changes a result bit.
  */
final case class Norm2Expr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"norm2sq expects array<double>, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(HashKernels.norm2sq(input.asInstanceOf[ArrayData]))

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.norm2sq($c)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 2-D Hilbert curve index of two pre-scaled int cell coordinates —
  * the clustering key behind Hilbert layout ([[graft.pipeline
  * .TableLayout.hilbertOrderWrite]]). Codegen'd like every kernel here;
  * it also sits in the write path, so the cost is once per written row.
  */
final case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  // explicit type + bits check: a wrong-typed/out-of-range SQL call
  // becomes an ANALYSIS error, not a codegen ClassCastException or a
  // silently degenerate curve (see HashKernels.hilbertIndex's guard)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType != IntegerType || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects (int, int, bits), got (${left.dataType}, ${right.dataType})")
    else if (bits < 1 || bits > 31)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_index bits must be in [1, 31], got $bits")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(HashKernels.hilbertIndex(
      bits, a.asInstanceOf[java.lang.Integer], b.asInstanceOf[java.lang.Integer]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.hilbertIndex($bits, $a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** n-dimensional Hilbert index over an `array<int>` of cell
  * coordinates — the layout-clustering kernel generalized past 2-D
  * ([[HashKernels.hilbertIndexN]], Skilling's transpose algorithm).
  */
final case class HilbertIndexNdExpr(child: Expression, bits: Int)
    extends UnaryExpression with KernelCodegen {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) if bits >= 1 && bits <= 31 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_index_nd bits must be in [1, 31], got $bits")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_index_nd expects array<int> coords, got $other")
    }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashKernels.hilbertIndexN(bits, input.asInstanceOf[ArrayData]))

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.hilbertIndexN($bits, $c)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Gopher-style repetition statistics of a space-tokenized document in
  * one kernel pass ([[HashKernels.repetitionStats]]): character
  * fraction of the most frequent word n-gram (n = 2..4) and duplicate
  * n-gram fraction 1 − distinct/total (n = 2..4), as a 6-double struct.
  */
final case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects a string, got ${child.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = RepetitionStatsExpr.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HashKernels.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"$kernels.repetitionStats($c)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    kernelGenCode(ctx, ev)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(
    Seq("top2_frac", "top3_frac", "top4_frac", "dup2_frac", "dup3_frac", "dup4_frac")
      .map(StructField(_, DoubleType, nullable = false)))
}

/** Count-min frequency estimate of a string key against a FROZEN sketch
  * (the bytes `CountMinSketch.writeTo` emits). The sketch rides the plan
  * as serialized bytes — the distributed pass is the sketch BUILD
  * (`df.stat.countMinSketch`); this probe expression evaluates inside
  * whole-stage codegen like any other scalar, so a probe over a
  * post-aggregation frame never breaks the codegen span the way a
  * closure UDF does. Deserialization happens once per executor task via
  * the transient lazy val (the generated code calls [[estimate]] through
  * a plan reference to this expression instance).
  */
final case class CmsEstimateExpr(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects a string key, got ${child.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  @transient private lazy val sketch: org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))

  /** Called from both interpreted eval and the generated code. */
  def estimate(key: UTF8String): Long = sketch.estimateCount(key.toString)

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(estimate(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimateExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {

  /** MinHash signature (array<long> of length k) over an array<string>. */
  def minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(c), k))

  /** 64-bit SimHash over an array<string>. */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c)))

  /** md5-based SimHash hex string (oracle twin of simhash64). */
  def md5_simhash_hex(c: Column): Column =
    ColumnBridge.column(Md5SimHashExpr(ColumnBridge.expression(c)))

  /** Word n-gram shingles over a space-tokenized string. */
  def ngram_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(NgramShinglesExpr(ColumnBridge.expression(c), n))

  /** Random-hyperplane LSH bucket over an array<double> embedding. */
  def rhp_bucket(c: Column, nbits: Int, table: Int): Column =
    ColumnBridge.column(RhpBucketExpr(ColumnBridge.expression(c), nbits, table))

  /** Karp-Rabin polynomial rolling hash of a string. */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHashExpr(ColumnBridge.expression(c)))

  /** All overlapping `minLen`-char window rolling hashes (array<long>,
    * one per 1-based window start; Karp–Rabin mod 2^61-1).
    */
  def window_hashes(c: Column, minLen: Int): Column =
    ColumnBridge.column(WindowHashesExpr(ColumnBridge.expression(c), minLen))

  /** Dot product of two array<double> columns (sequential fold). */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Winnowing min-md5-prefix fingerprint over `window`-char substrings. */
  def winnow_min(c: Column, window: Int): Column =
    ColumnBridge.column(WinnowMinExpr(ColumnBridge.expression(c), window))

  /** md5-based MinHash signature (oracle-reproducible variant). */
  def md5_minhash_sig(c: Column, k: Int): Column =
    ColumnBridge.column(Md5MinHashSigExpr(ColumnBridge.expression(c), k))

  /** Count-min estimate of a string key against a frozen serialized
    * sketch (codegen'd — no closure UDF).
    */
  def cms_estimate(c: Column, sketchBytes: Array[Byte]): Column =
    ColumnBridge.column(CmsEstimateExpr(ColumnBridge.expression(c), sketchBytes))

  /** 2-D Hilbert curve index of two int cell coordinates in
    * [0, 2^bits).
    */
  def hilbert_index(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndexExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** Repetition statistics struct (top/dup n-gram fractions, n=2..4). */
  def repetition_stats(c: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(c)))

  /** n-D Hilbert curve index of an array<int> of cell coordinates. */
  def hilbert_index_nd(coords: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndexNdExpr(ColumnBridge.expression(coords), bits))
}
