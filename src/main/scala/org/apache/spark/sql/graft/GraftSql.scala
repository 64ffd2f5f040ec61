/*
 * Minimal private[sql] bridge for the graft extension operators.
 *
 * Building a DataFrame over a CUSTOM LogicalPlan node (graft.plans.AsofJoin)
 * requires `Dataset.ofRows`, which Spark scopes private[sql]; placing this
 * one-file shim inside the org.apache.spark.sql package tree is the standard
 * deployment pattern for open-source Spark extensions that add plan nodes
 * (the same access route Spark's own connectors and several public extension
 * libraries use). Nothing else in the repo lives outside the graft package,
 * and nothing here touches non-public behavior beyond plan construction.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

object GraftSql {
  /** DataFrame over an arbitrary (possibly custom-node) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes usable
    * as join keys of a custom node). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
