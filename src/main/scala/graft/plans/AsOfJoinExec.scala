package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical as-of join: copartitioned streaming sort-merge.
  *
  * Scale shape (the reason this operator exists): EnsureRequirements
  * satisfies the declared requirements with ONE hash exchange per side
  * on the join keys plus a per-partition (keys, time) sort — after
  * that the merge is a single forward pass holding O(1) state (the
  * current right row and the last still-eligible candidate). No
  * range-join row explosion, no union of the two schemas, no window
  * buffer proportional to a key's row count. Skewed keys cost only
  * their own partition's sort, never a cross product.
  *
  * Right rows with null keys or null time are advanced past but never
  * match (DuckDB ASOF semantics); left rows with null keys or null
  * time emit the null right side. Ties on (keys, time) on the right
  * resolve to the last row in sort order — callers wanting
  * determinism dedupe the right side to one row per (keys, time),
  * same contract as the window formulation in `q_asof_join`.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  // tolerance compares raw time differences, so it needs a long-backed
  // time type (timestamp = µs, date = days, long/int = themselves)
  tolerance.foreach { t =>
    require(t >= 0, s"as-of tolerance must be >= 0, got $t")
    require(AsOfJoinExec.longBacked(leftTime.dataType),
      s"as-of tolerance needs a long-backed time type, got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  /** Merge preserves the left side's order and partitioning. */
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // bind against the nullable-marked OUTPUT attrs, not lOut ++ rOut:
      // BindReferences takes nullability from the input side, and a
      // non-nullable right column read from the null-padded row without
      // a null check yields 0/false (or NPEs) instead of NULL
      val project = UnsafeProjection.create(outAttrs, outAttrs)

      val tolOpt = tolerance
      val timeAsLong: InternalRow => Long = AsOfJoinExec.longReader(timeType)

      new Iterator[InternalRow] {
        // head of the right side, owned copy (child iterators reuse rows)
        private var nextRight: InternalRow = _
        // last advanced-past right row whose keys+time were non-null
        private var cand: InternalRow = _
        private var candTime: Long = 0L

        private def readRight(): Unit =
          nextRight = if (rIter.hasNext) rIter.next().copy() else null
        readRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeProj(lRow)
          val lNull = lKey.anyNull || lTime.isNullAt(0)
          // advance while right sorts at-or-before (lKey, lTime)
          var advancing = nextRight != null
          while (advancing) {
            val rKey = rKeyProj(nextRight)
            val kc = keyOrd.compare(rKey, lKey)
            val rTime = rTimeProj(nextRight)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTime, lTime) <= 0)) {
              if (!rKey.anyNull && !rTime.isNullAt(0)) {
                cand = nextRight
                if (tolOpt.isDefined) candTime = timeAsLong(rTime)
              }
              readRight()
              advancing = nextRight != null
            } else advancing = false
          }
          val matched = !lNull && cand != null &&
            keyOrd.compare(rKeyProj(cand), lKey) == 0 &&
            tolOpt.forall { t =>
              // sort order guarantees candTime <= lTime, so the true gap
              // is non-negative; raw-long time columns can still overflow
              // the subtraction, and an overflowed gap is by definition
              // beyond any tolerance
              try java.lang.Math.subtractExact(timeAsLong(lTime), candTime) <= t
              catch { case _: ArithmeticException => false }
            }
          numOutputRows += 1
          if (matched) {
            numMatched += 1
            project(joined(lRow, cand))
          } else {
            project(joined(lRow, nullRight))
          }
        }
      }
    }
  }
}

object AsOfJoinExec {
  import org.apache.spark.sql.types._

  private[plans] def longBacked(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | LongType | IntegerType | DateType => true
    case _ => false
  }

  /** Reader for the single-column time row as a raw long (timestamp =
    * µs since epoch, date = days, int/long = themselves).
    */
  private[plans] def longReader(dt: DataType): org.apache.spark.sql.catalyst.InternalRow => Long =
    dt match {
      case TimestampType | TimestampNTZType | LongType => r => r.getLong(0)
      case IntegerType | DateType => r => r.getInt(0).toLong
      case other => throw new IllegalArgumentException(s"not long-backed: $other")
    }
}
