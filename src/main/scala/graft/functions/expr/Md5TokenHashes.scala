package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-token md5 halves as LONGS in one digest pass — the native form of the
  * engine's token-hash chain
  *
  *   `transform(ts, t => conv(substring(md5(t), 1, 8), 16, 10).cast(long))`
  *
  * (and its two-half struct sibling, [[Md5HalfPairs]]). The composed chain
  * pays, PER TOKEN: a hex-encode of the 16-byte digest into a 32-char string,
  * one or two UTF8String substrings, and one or two `conv` base-16 string
  * parses back to the very bytes the digest already held — r19 profile: the
  * LSH signature build (q36/q86/q130/q134/q141/q93/q114 all stand on it) was
  * 17-30 CPU-seconds per query at sf0.1, the engine's densest per-row
  * arithmetic. These expressions take the digest's leading bytes directly:
  *
  *   h1 = bytes 0-3 as an unsigned 32-bit value (== conv(hex[1..8], 16, 10))
  *   h2 = bytes 4-7 as an unsigned 32-bit value (== conv(hex[9..16], 16, 10))
  *
  * Bit-identical by construction: md5's hex rendering is the byte sequence in
  * order, so the first 8 hex chars ARE bytes 0-3, and `conv(_, 16, 10)` casts
  * to the same non-negative long. Null contracts mirror the composed forms
  * exactly (Md5HalfSpec pins both, element-for-element, on fixture tokens):
  * null array → null; null element → null long ([[Md5Half]]) / non-null
  * struct with null fields ([[Md5HalfPairs]] — `struct(null, null)` is what
  * `transform(t => struct(conv(md5(null))...))` yields).
  *
  * `GRAFT_TOKENHASH_FOLD=1` switches callers back to the composed chain
  * (the established GRAFT_*_FOLD A/B pattern).
  */
abstract class Md5TokenHashBase extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  @transient protected lazy val md =
    java.security.MessageDigest.getInstance("MD5")
}

object Md5TokenHashBase {
  /** (h1, h2) from one md5 digest of the UTF-8 bytes — the shared kernel of
    * both expressions' interpreted and generated paths.
    */
  def halves(md: java.security.MessageDigest, s: UTF8String): (Long, Long) = {
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
       ((d(2) & 0xffL) << 8) | (d(3) & 0xffL),
     ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
       ((d(6) & 0xffL) << 8) | (d(7) & 0xffL))
  }
}

/** array<string> → array<long>: first md5 half per token (h1). */
case class Md5Half(child: Expression) extends Md5TokenHashBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_md5half"

  override def nullSafeEval(input: Any): Any = {
    val ts = input.asInstanceOf[ArrayData]
    val n = ts.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!ts.isNullAt(i))
        out(i) = Long.box(Md5TokenHashBase.halves(md, ts.getUTF8String(i))._1)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "md5half",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      val gadCls = classOf[GenericArrayData].getName
      // NOTE: continuation lines must NOT start with `|` — downstream code
      // templating strips it as a margin character, silently deleting the
      // bitwise-OR and producing unparseable Java; the stage then falls back
      // to INTERPRETED execution with no test signal (found at the 10× rung;
      // Md5HalfSpec now compiles with codegen fallback disabled to pin this)
      s"""
         |int $n = $x.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    byte[] $d = $mdRef.digest($x.getUTF8String($i).getBytes());
         |    long $h = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |      (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
         |    $out[$i] = Long.valueOf($h);
         |  }
         |}
         |${ev.value} = new $gadCls($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Half =
    copy(child = newChild)
}

/** array<string> → array<struct<h1:long,h2:long>>: both md5 halves per token
  * (the Kirsch–Mitzenmacher pair feeding the minhash signature).
  */
case class Md5HalfPairs(child: Expression) extends Md5TokenHashBase {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("h1", LongType), StructField("h2", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_md5halfpairs"

  override def nullSafeEval(input: Any): Any = {
    val ts = input.asInstanceOf[ArrayData]
    val n = ts.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (ts.isNullAt(i))
        out(i) = InternalRow(null, null)
      else {
        val (h1, h2) = Md5TokenHashBase.halves(md, ts.getUTF8String(i))
        out(i) = InternalRow(h1, h2)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "md5pairs",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val f = ctx.freshName("f")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val out = ctx.freshName("out")
      val gadCls = classOf[GenericArrayData].getName
      val girCls = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      // see Md5Half.doGenCode: no `|`-leading continuation lines
      s"""
         |int $n = $x.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  Object[] $f = new Object[2];
         |  if (!$x.isNullAt($i)) {
         |    byte[] $d = $mdRef.digest($x.getUTF8String($i).getBytes());
         |    long $h1 = (($d[0] & 0xffL) << 24) | (($d[1] & 0xffL) << 16) |
         |      (($d[2] & 0xffL) << 8) | ($d[3] & 0xffL);
         |    long $h2 = (($d[4] & 0xffL) << 24) | (($d[5] & 0xffL) << 16) |
         |      (($d[6] & 0xffL) << 8) | ($d[7] & 0xffL);
         |    $f[0] = Long.valueOf($h1);
         |    $f[1] = Long.valueOf($h2);
         |  }
         |  $out[$i] = new $girCls($f);
         |}
         |${ev.value} = new $gadCls($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5HalfPairs =
    copy(child = newChild)
}
