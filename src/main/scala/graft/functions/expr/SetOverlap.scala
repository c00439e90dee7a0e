package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass distinct-set overlap counts over long arrays: the containment
  * verify's primitive (q93, `DedupFunctions.containmentPairs`). Where Jaccard
  * needs one ratio, containment needs THREE counts per pair —
  * |A∩B|, |A|, |B| — and the composed form pays an `array_intersect` (hash
  * set + result array) plus TWO `array_distinct`s per candidate pair. This
  * returns all three from a single open-addressed table pass, no intermediate
  * arrays.
  *
  * Semantics exactly match the composed builtins: distinct-set counts, a NULL
  * ELEMENT counts as one distinct element per side and intersects only when
  * both sides carry one (array_intersect/array_distinct treatment); a NULL
  * ARRAY propagates null.
  */
object SetOverlapHelper {

  /** @return (intersection, |distinct a|, |distinct b|) as an InternalRow. */
  def overlap(a: ArrayData, b: ArrayData): InternalRow = {
    val na = a.numElements()
    val nb = b.numElements()
    var cap = 16
    while (cap < (na + nb) * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val state = new Array[Byte](cap)
    val mask = cap - 1
    var da = 0; var db = 0; var inter = 0
    var aHasNull = false; var bHasNull = false

    def slot(k: Long): Int = {
      var h = k * -7046029254386353131L
      h ^= (h >>> 32)
      var i = (h.toInt & mask)
      while (state(i) != 0 && keys(i) != k) i = (i + 1) & mask
      i
    }

    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else {
        val k = a.getLong(i)
        val s = slot(k)
        if (state(s) == 0) { keys(s) = k; state(s) = 1; da += 1 }
      }
      i += 1
    }
    i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else {
        val k = b.getLong(i)
        val s = slot(k)
        state(s) match {
          case 0 => keys(s) = k; state(s) = 2; db += 1
          case 1 => state(s) = 3; inter += 1; db += 1
          case _ => ()
        }
      }
      i += 1
    }
    if (aHasNull) da += 1
    if (bHasNull) db += 1
    if (aHasNull && bHasNull) inter += 1
    InternalRow(inter, da, db)
  }
}

/** Native `graft_overlap(a, b)` → struct(inter, na, nb) over two
  * `ARRAY<BIGINT>` columns. Null arrays propagate null (`nullSafeEval`).
  */
case class SetOverlap(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = left.nullable || right.nullable

  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) | ArrayType(NullType, _) | NullType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l, r) if ok(l) && ok(r) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("inter", IntegerType, nullable = false),
    StructField("na", IntegerType, nullable = false),
    StructField("nb", IntegerType, nullable = false)))

  override def prettyName: String = "graft_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOverlapHelper.overlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expr.SetOverlapHelper.overlap($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetOverlap =
    copy(left = newLeft, right = newRight)
}
