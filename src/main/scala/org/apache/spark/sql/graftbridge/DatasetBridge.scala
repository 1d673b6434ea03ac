package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge to the `private[sql]` Dataset constructor so custom logical
  * plans (graft.plans.*) can surface as user DataFrames. Same pattern
  * as [[ColumnBridge]] — the one `private[sql]` hop a Spark extension
  * library needs, kept in a single tiny file.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-wrap a just-checkpointed frame WITHOUT the origin statistics
    * `Dataset.checkpoint` carries forward. A checkpoint cuts lineage
    * but propagates the OPTIMIZER'S size estimate of the pre-checkpoint
    * plan (`LogicalRDD.originStats`) — correct for one hop, but an
    * iterative loop whose state frame feeds k>1 join branches per
    * round multiplies those estimates k-fold in BITS per round:
    * doubly-exponential sizeInBytes, Catalyst planning sinking into
    * megabit BigInteger multiplications, and eventually "BigInteger
    * would overflow supported range" (see SgnsOps.train). Severing the
    * stats resets the leaf to `defaultSizeInBytes` — loops that hint
    * their joins explicitly (the graft loop discipline) lose nothing.
    * No-op for any other plan shape.
    */
  def resetCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        classic.Dataset.ofRows(
          df.sparkSession.asInstanceOf[classic.SparkSession],
          org.apache.spark.sql.execution.LogicalRDD(
            lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
            lr.isStreaming)(
            df.sparkSession.asInstanceOf[classic.SparkSession], None, None))
      case _ => df
    }
}
