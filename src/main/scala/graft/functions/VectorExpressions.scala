package graft.functions

import org.apache.spark.sql.{Column, GraftDoubleArrayInputs, GraftExpressionShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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
    // GraftDoubleArrayInputs = ImplicitCastInputTypes over two
    // array<double> inputs (shim-resident — AbstractDataType is
    // private[sql]): the SQL surface (graft_vec_dot) coerces
    // array<int>/array<float> arguments like the built-in
    // aggregate(zip_with(...)) route it replaces, instead of raising
    // DATATYPE_MISMATCH where the documented equivalent quietly coerced.
    extends BinaryExpression with GraftDoubleArrayInputs {

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

/** Distinct-intersection COUNT of two SORTED long arrays — the verify
  * kernel of the exact set-similarity join. `array_intersect` hashes one
  * side per row (per-pair set build + probe, allocation-heavy at 600k
  * candidate pairs); for pre-sorted hash arrays the count is one fused
  * two-pointer merge walk, no allocation, whole-stage-codegen'd.
  * Duplicate values (intra-array hash collisions) count ONCE — exactly
  * `size(array_intersect(a, b))` on the same inputs (spec-pinned).
  *
  * PRECONDITION: both arrays ascending-sorted (the operator builds them
  * with `array_sort`); an unsorted input silently undercounts, so this
  * stays an internal kernel rather than a user-facing function.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  /** NULL on a null element (never a partial count) — the DotProduct
    * rule: corrupt rows stay visible instead of plausibly counted. The
    * hot path (non-null-element arrays) never emits the branch. The
    * override matters exactly as it does on DotProduct: without it,
    * non-nullable inputs whose ELEMENT type admits nulls would hand
    * nullSafeCodeGen a FalseLiteral isNull and the emitted
    * `false = true;` fails Janino compilation (interpreted fallback
    * then unboxes the null to a plausible 0).
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
    val n = x.numElements(); val m = y.numElements()
    // Null elements sort LAST under the array_sort precondition, so a
    // last-element check sees EVERY null — the merge walk alone would
    // exit at the shorter side and return a definite count with nulls
    // still unvisited in the tail (the documented contract violation).
    if (mayHaveNullElems &&
        ((n > 0 && x.isNullAt(n - 1)) || (m > 0 && y.isNullAt(m - 1))))
      return null
    var i = 0; var j = 0; var cnt = 0L
    while (i < n && j < m) {
      if (mayHaveNullElems && (x.isNullAt(i) || y.isNullAt(j))) return null
      val ai = x.getLong(i); val bj = y.getLong(j)
      if (ai < bj) i += 1
      else if (ai > bj) j += 1
      else {
        cnt += 1
        // Dup-skip walks probe isNullAt only when the element type admits
        // nulls — getLong on a null slot would otherwise read garbage 0s
        // and over-skip; for non-null-element arrays (the prefix-join hot
        // path at corpus-pair volume) the probes are pure overhead.
        if (mayHaveNullElems) {
          while (i < n && !x.isNullAt(i) && x.getLong(i) == ai) i += 1
          while (j < m && !y.isNullAt(j) && y.getLong(j) == bj) j += 1
        } else {
          while (i < n && x.getLong(i) == ai) i += 1
          while (j < m && y.getLong(j) == bj) j += 1
        }
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val cnt = ctx.freshName("cnt")
      val ai = ctx.freshName("ai"); val bj = ctx.freshName("bj")
      val nullElemCheck =
        if (mayHaveNullElems)
          s"""if ($a.isNullAt($i) || $b.isNullAt($j)) {
             |    ${ev.isNull} = true; break;
             |  }""".stripMargin
        else ""
      // Tail nulls: see nullSafeEval — nulls sort last, so the
      // last-element guard catches what the merge walk never visits.
      val tailNullGuard =
        if (mayHaveNullElems)
          s"""($n > 0 && $a.isNullAt($n - 1)) ||
             |    ($m > 0 && $b.isNullAt($m - 1))""".stripMargin
        else "false"
      // The dup-skip walks' per-element isNullAt probes are gated like
      // the merge-walk check: containsNull=false inputs (the prefix-join
      // hot path) emit a bare getLong comparison — spec-pinned by a
      // generated-code assertion (no isNullAt anywhere in the codegen).
      val aNotNull = if (mayHaveNullElems) s"!$a.isNullAt($i) && " else ""
      val bNotNull = if (mayHaveNullElems) s"!$b.isNullAt($j) && " else ""
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |if ($tailNullGuard) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0; int $j = 0;
         |  long $cnt = 0L;
         |  while ($i < $n && $j < $m) {
         |    $nullElemCheck
         |    long $ai = $a.getLong($i);
         |    long $bj = $b.getLong($j);
         |    if ($ai < $bj) { $i++; }
         |    else if ($ai > $bj) { $j++; }
         |    else {
         |      $cnt++;
         |      while ($i < $n && $aNotNull$a.getLong($i) == $ai) $i++;
         |      while ($j < $m && $bNotNull$b.getLong($j) == $bj) $j++;
         |    }
         |  }
         |  ${ev.value} = $cnt;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftExpressionShim.column(DotProduct(
      GraftExpressionShim.expression(a), GraftExpressionShim.expression(b)))

  /** Codegen'd distinct-intersection count of two SORTED long arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftExpressionShim.column(SortedLongIntersectCount(
      GraftExpressionShim.expression(a), GraftExpressionShim.expression(b)))
}
