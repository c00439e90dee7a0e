package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Shared skeleton of the element-paired double-array fold expressions
  * ([[DotProduct]], [[SquaredDistance]]): strict (array<double>,
  * array<double>) typing, the fold's exact null contract (null array →
  * null, length mismatch → null, null ELEMENT → null — never a silent
  * zero), left-to-right summation so results stay bit-identical to the
  * higher-order `aggregate(zip_with(...))` form and to the DuckDB oracles'
  * `list_sum(list_transform(...))`, and one tight generated loop inside
  * whole-stage codegen. Subclasses supply only the per-element term —
  * interpreted ([[termEval]]) and generated ([[termJava]]) — so the
  * null/length/codegen logic can never drift between them.
  */
abstract class PairedDoubleArrayFold extends BinaryExpression {

  /** The per-element contribution, interpreted path. */
  protected def termEval(x: Double, y: Double): Double

  /** Generated statements adding this element's contribution to `s`;
    * `x`/`y` are ArrayData variables, `i` the loop index.
    */
  protected def termJava(ctx: CodegenContext, s: String,
                         x: String, y: String, i: String): String

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
        s += termEval(x.getDouble(i), y.getDouble(i))
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
         |    ${termJava(ctx, s, x, y, i)}
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
}
