package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API: `ExpressionUtils` is `private[sql]` in Spark 4, so the
  * Column⇄Expression conversion lives in this one-file shim inside the
  * `org.apache.spark.sql` package (the standard extension-library
  * pattern).
  */
object GraftExpressionShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a populated [[SparkSessionExtensions]]' injected functions to
    * an ALREADY-BUILT session's registry — the late-binding complement of
    * `spark.sql.extensions` (which only applies at session construction).
    * `registerFunctions` and `sessionState` are `private[sql]`, hence
    * shim-resident; the exact same injection list feeds both paths, so a
    * REPL/test registration can never drift from the config-driven one.
    */
  def applyFunctions(spark: SparkSession, ext: SparkSessionExtensions): Unit =
    ext.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)

  /** Spark's own documentation root — the `<docroot>` parameter every
    * WRONG_NUM_ARGS-class error message template interpolates.
    * `SparkBuildInfo` is `private[spark]`, hence shim-resident.
    */
  def sparkDocRoot: String = org.apache.spark.SparkBuildInfo.spark_doc_root
}

/** `ImplicitCastInputTypes` over two `array<double>` inputs, as a
  * shim-resident trait: `AbstractDataType` (the `inputTypes` element
  * type) is `private[sql]`, so an expression outside this package cannot
  * spell the override itself. Mixing this in gives graft's vector
  * expressions the standard implicit ArrayType coercion — SQL callers
  * passing `array<int>`/`array<float>` coerce exactly like the built-in
  * HOF route the expressions replace, instead of DATATYPE_MISMATCH.
  */
trait GraftDoubleArrayInputs
    extends catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  override def inputTypes: Seq[types.AbstractDataType] =
    Seq(types.ArrayType(types.DoubleType), types.ArrayType(types.DoubleType))
}
