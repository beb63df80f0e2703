package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one sanctioned crossing into Spark's private[sql] surface:
  * building a DataFrame from a custom LogicalPlan node requires
  * `Dataset.ofRows`, which extension libraries reach exactly this
  * way (a bridge object under org.apache.spark.sql — the same trick
  * every published Spark connector/extension uses). Nothing else in
  * graft touches non-public API.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
