package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made the classic converters (`classic.ExpressionUtils`)
  * private[sql]; third-party expression libraries conventionally expose
  * them through a small object in the org.apache.spark.sql package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function into an ALREADY-RUNNING session's registry —
    * the runtime-registration twin of GraftExtensions (which covers
    * sessions built with spark.sql.extensions).
    */
  def registerFunction(spark: SparkSession,
                       name: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)

  /** AnalysisException with a plain message — the (message) constructor
    * is private[sql] in Spark 4; SQL-facing argument validation (bad
    * literal args to graft's function builders) should surface as an
    * analysis error, not a raw IllegalArgumentException.
    */
  def analysisError(message: String): AnalysisException =
    new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100", // generic pass-through message class
      messageParameters = Map("message" -> message))
}
