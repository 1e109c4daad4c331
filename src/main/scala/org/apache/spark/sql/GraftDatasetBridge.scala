package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `org.apache.spark.sql`-package shim in this library: turns a
  * custom [[LogicalPlan]] node into a user-facing [[DataFrame]].
  *
  * `Dataset.ofRows` is `private[sql]`, and planting a wrapper inside the
  * package is the established pattern every Spark-extension library uses
  * to construct DataFrames over injected plan nodes (Delta Lake's
  * `org.apache.spark.sql.delta.*`, Sedona, GraphFrames all ship one).
  * Nothing else of Spark's internals is re-exported here — this is the
  * narrowest possible doorway, kept in its own file so the boundary
  * between engine code (`graft.*`) and host-package code stays visible.
  */
object GraftDatasetBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
