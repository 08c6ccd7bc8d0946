package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors the public extension-points API
  * does not expose: building a DataFrame from a custom [[LogicalPlan]] node.
  * This is the standard pattern used by Spark-ecosystem libraries that add
  * whole-operator plans; the shim is the ONLY file outside the `graft`
  * namespace and contains no logic.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Build a DataFrame over an InternalRow RDD (round-21: the
    * sampling-free z-order exchange re-enters SQL through this —
    * `internalCreateDataFrame` is private[sql]). */
  def internalCreateDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, false)

  /** Canonical v2 Column[] → StructType conversion (keeps generation
    * expression / identity metadata) — `CatalogV2Util` is private[sql]. */
  def v2ColumnsToStructType(
      cols: Array[org.apache.spark.sql.connector.catalog.Column])
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(cols)
}
