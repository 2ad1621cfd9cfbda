package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into the `private[sql]` Dataset constructor so library
  * code can wrap a hand-built resolved [[LogicalPlan]] (the custom
  * as-of-join node, `graft.plans.AsofJoinPlan`) back into a public
  * DataFrame. Lives under `org.apache.spark.sql` for access scope only —
  * the standard extension-library pattern; no Spark internals are
  * modified or shadowed.
  */
object CatalystBridge {

  /** The analyzed (resolved-attribute) plan of a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a resolved logical plan as a DataFrame on `df`'s session. */
  def ofRows(df: DataFrame, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      df.asInstanceOf[classic.Dataset[Row]].sparkSession, plan)
}
