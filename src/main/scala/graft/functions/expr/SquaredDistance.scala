package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen squared-L2 distance over two `ARRAY<DOUBLE>` columns — the
  * k-means/k-center hot path ([[graft.operators.KMeansLite]] evaluates one
  * of these per (row, centroid) per iteration; q65/q81/q109/q112/q156).
  * Same rationale and contract as [[DotProduct]]: one tight loop inside
  * whole-stage codegen instead of an interpreted higher-order fold, with
  * summation left-to-right so results are BIT-IDENTICAL to
  * `aggregate(zip_with(a, b, (x, c) => (x-c)*(x-c)), 0.0, +)` and to the
  * oracle's `list_sum(list_transform(...))`. Null handling mirrors the
  * fold: null/length-mismatched arrays and null elements all yield NULL;
  * the element null checks drop out of the generated loop when both
  * schemas declare `containsNull=false`.
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sqdist"

  private def mayHaveNullElements: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      val checkNulls = mayHaveNullElements
      var s = 0.0
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val d = x.getDouble(i) - y.getDouble(i)
        s += d * d
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val nullCheck = if (mayHaveNullElements)
        s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}
