package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions.
  * Spark 4 made the Column<->Expression conversions `private[sql]`
  * (columnNodeSupport.scala); extension libraries shipping native
  * expressions use a package-located shim like this one.
  */
object GraftShims {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** DataFrame from a hand-built LogicalPlan (Dataset.ofRows is
    * private[sql]); the seam that lets the library's custom logical
    * operators enter the public Dataset API. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Temp-function registration on a live session (sessionState is
    * private[sql]); the SparkSessionExtensions path covers sessions the
    * library gets to construct itself. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
