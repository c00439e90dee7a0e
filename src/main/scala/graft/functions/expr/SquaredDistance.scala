package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext

/** Native codegen squared-L2 distance over two `ARRAY<DOUBLE>` columns — the
  * k-means/k-center hot path ([[graft.operators.KMeansLite]] evaluates one
  * of these per (row, centroid) per iteration; q65/q81/q109/q112/q156).
  * Contract and rationale: see [[PairedDoubleArrayFold]] — results are
  * BIT-IDENTICAL to `aggregate(zip_with(a, b, (x, c) => (x-c)*(x-c)),
  * 0.0, +)` and to the oracles' `list_sum(list_transform(...))`.
  * Measured 24–32% faster warm than the fold on the k-means family
  * (BASELINE.md r8).
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends PairedDoubleArrayFold {

  override def prettyName: String = "graft_sqdist"

  override protected def termEval(x: Double, y: Double): Double = {
    val d = x - y
    d * d
  }

  override protected def termJava(ctx: CodegenContext, s: String,
                                  x: String, y: String, i: String): String = {
    val d = ctx.freshName("d")
    s"""double $d = $x.getDouble($i) - $y.getDouble($i);
       |    $s += $d * $d;""".stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}
