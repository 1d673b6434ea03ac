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
}
