package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge into `private[sql]` plan construction — the standard escape
  * hatch every Spark extension library uses to turn a custom
  * LogicalPlan into a public DataFrame (Dataset.ofRows is private to
  * the sql package). Kept to this single call. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
