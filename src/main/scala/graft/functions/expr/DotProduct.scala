package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `ARRAY<DOUBLE>` columns — the one spot
  * in the engine where a custom Catalyst `Expression` beats every alternative
  * (build-prompt preference order: compose > Expression > custom plan >
  * mapPartitions):
  *
  *  - the higher-order `aggregate(zip_with(...))` fold is evaluated
  *    interpreted, per pair, in similarity joins;
  *  - unrolling to a 64-term expression tree blows codegen/JIT method limits
  *    (measured 2-3× slower, see SimilarityFunctions.withNormalized);
  *  - this expression emits ONE tight Java loop inside whole-stage codegen.
  *
  * Summation order is left-to-right like the fold, so results are
  * bit-identical to `SimilarityFunctions.dot` (and to the DuckDB oracle's
  * `list_sum(list_transform(...))`). Null elements are not expected
  * (embedding vectors); null arrays propagate null via `nullSafeEval`, and
  * length-mismatched arrays return NULL — the same answer the
  * `aggregate(zip_with(...))` fold gives (zip_with pads with nulls), so the
  * two forms never silently diverge.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // mismatched lengths yield null even over non-null inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
