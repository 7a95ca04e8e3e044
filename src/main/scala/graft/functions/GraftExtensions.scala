package graft.functions

import org.apache.spark.sql.{AnalysisException, GraftExpressionShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Floor, Literal, Multiply}

/** SQL surface for graft's custom expressions, registered through the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  *   // or, on an already-built session (tests, REPL):
  *   GraftExtensions.register(spark)
  * }}}
  *
  * Functions:
  *   - `graft_vec_dot(a, b)` — the codegen'd [[DotProduct]] loop
  *     (null, never a partial sum, on mismatched/null-element arrays).
  *   - `graft_q6(x)` — [[Quant.q6]] floor-quantization to the 1e-6 grid,
  *     the engine-identical rounding every emitted double in this library
  *     uses; exposed so ad-hoc SQL can match the operators' contract.
  *
  * Both entry points share ONE injection list: `register` routes through
  * a populated extensions object (shim-applied to the live registry), so
  * the late-binding path can never drift from the config-driven one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      // The error shape SQL tooling catches by: Spark's own builders
      // raise AnalysisException with the WRONG_NUM_ARGS error class
      // (sqlState 42605) on a bad call — a bare IllegalArgumentException
      // here escaped every catch keyed on AnalysisException/SparkThrowable
      // and carried no error class for structured clients. The 2-arg
      // (errorClass, messageParameters) constructor is public API;
      // parameter names come from the WRONG_NUM_ARGS.WITHOUT_SUGGESTION
      // template in error-conditions.json (functionName is rendered
      // pre-quoted by convention — toSQLId — hence the backticks).
      if (args.size != n)
        throw new AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> n.toString,
            "actualNum" -> args.size.toString,
            "docroot" -> GraftExpressionShim.sparkDocRoot))
      build(args)
    }

  /** The injected (identifier, info, builder) triples — the single
    * source for both registration paths.
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_vec_dot"),
      arity("graft_vec_dot", 2)(args => DotProduct(args(0), args(1)))),
    (FunctionIdentifier("graft_q6"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "graft_q6"),
      // Raw Catalyst mirror of Quant.q6 (floor(x·1e6)/1e6): a Column
      // built inside a function builder stays an unresolved
      // ColumnNodeExpression the analyzer never descends into (measured:
      // INTERNAL_ERROR at codegen), so the column kernel cannot be
      // reused here — the spec pins the two forms equal instead.
      arity("graft_q6", 1)(args =>
        Divide(Floor(Multiply(args.head, Literal(1e6))), Literal(1e6)))))

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftExpressionShim.applyFunctions(spark, ext)
  }
}
