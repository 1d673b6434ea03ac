package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for each left row, attach the single right row
  * with equal keys and the greatest `rightTime <= leftTime` (left-outer
  * semantics — unmatched left rows keep null right columns).
  *
  * This is the whole-operator tier of the extension story (brief
  * preference (c)): Spark's built-ins can express as-of only via the
  * union+window trick ([[graft.ops.AdvancedOps]] `q_asof_join`) or an
  * exploding range join. This node + [[GraftStrategy]] +
  * [[AsOfJoinExec]] give it first-class plan semantics instead: the
  * physical operator declares a clustered distribution on the keys and
  * a (keys, time) sort per side, so EnsureRequirements plans exactly
  * one hash shuffle per side and the join itself is a streaming
  * per-partition merge — no union of payload columns, no window-state
  * buffering, and each side keeps its own schema.
  *
  * Semantics match DuckDB `ASOF LEFT JOIN` (the oracle for
  * `q_asof_native`): null keys and null times never match.
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long] = None)
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length, "as-of join key arity mismatch")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}
