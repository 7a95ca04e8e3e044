package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector expressions for the similarity-search path.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) allocates
  * an intermediate array per row and evaluates the lambda through the
  * higher-order-function machinery — per-pair cost that dominates an
  * all-pairs similarity scan. `DotProduct` is a plain BinaryExpression
  * with `doGenCode`, so the whole loop inlines into whole-stage codegen:
  * one fused multiply-add loop over the two ArrayData buffers, no
  * allocation. (SURVEY §7.3 anticipated no custom expressions; profiling
  * the 0.1-SF benchmark justified this one — the brute-force near-dup
  * scan spent ~70 s in HOF evaluation.)
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  /** NULL — never a partial sum — for malformed inputs: mismatched
    * lengths or a null element. This is the `aggregate(zip_with(...))`
    * route's semantics (zip_with pads the shorter side with null, the
    * fold then nulls out), and it keeps corrupt/truncated embedding rows
    * VISIBLE as null cosines instead of finite, plausible ones (DuckDB's
    * list_dot_product errors on a length mismatch — a silent min-length
    * truncation here would mask exactly the rows the oracle trips on).
    */
  override def nullable: Boolean = true

  @transient private lazy val mayHaveNullElems: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (mayHaveNullElems && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // The per-element null branch is emitted only when an input's type
      // admits null elements — the fixed-width embedding hot path keeps
      // the bare fused multiply-add loop.
      val nullElemCheck =
        if (mayHaveNullElems)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |    ${ev.isNull} = true; break;
             |  }""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftExpressionShim.column(DotProduct(
      GraftExpressionShim.expression(a), GraftExpressionShim.expression(b)))
}
