package graft.functions.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper with a JVM-stable address for generated code (Scala emits a
  * static forwarder on the object's class, so codegen can call it without a
  * broadcast reference object).
  */
object NfcHelper {
  /** Unicode NFC normalization (canonical composition). Two-tier fast path:
    * pure-ASCII input (the dominant case in web corpora) is detected by a
    * byte scan on the UTF8String — no allocation at all, ASCII is always
    * NFC; non-ASCII input pays one toString, and only text that is actually
    * denormalized pays the Normalizer pass + copy back.
    */
  def nfc(s: UTF8String): UTF8String = {
    var i = 0
    val n = s.numBytes()
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization as a native codegen `Expression` — the text-clean
  * first pass of a training-data pipeline (é as e+combining-acute and é as a
  * single codepoint must fingerprint identically before any dedup).
  *
  * Spark has no built-in Unicode normalizer, and a Scala UDF here would put a
  * serialization wall in front of every downstream codegen'd text op; this
  * expression stays inside whole-stage codegen (one static call per row).
  * Registered on the SQL surface as `graft_nfc` (GraftExtensions).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // NullType: a literal NULL argument stays legal (evaluates to NULL),
    // matching built-in string functions like upper(NULL)
    case _: StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcHelper.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.NfcHelper.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
