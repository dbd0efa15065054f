package org.apache.spark.sql.graftops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for wrapping a hand-built `LogicalPlan` into a `DataFrame`
  * (`Dataset.ofRows` went `private[sql]` with the Spark 4 classic split).
  * Same convention as [[ColumnBridge]]: the only internals reach-in,
  * one line.
  */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
