package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** All `numHashes` MinHash samples in ONE pass over the token hash pairs —
  * replaces `numHashes` interpreted `array_min(transform(...))` evaluations
  * (graft.functions.DedupFunctions.minhashSignatureFromPairs) with a single
  * codegen'd tokens × hashes loop.
  *
  * Bit-identical semantics: sample i = min over tokens of (h1 + i·h2) mod P,
  * P = 4294967311 (Kirsch–Mitzenmacher construction); inputs are 32-bit
  * non-negative halves of one md5 per token, so plain `%` equals `pmod` and
  * i·h2 cannot overflow a long for any realistic numHashes. An empty token
  * array yields an array of nulls, exactly like `array_min` over an empty
  * array (and like the DuckDB oracle's `list_min`).
  */
case class MinhashSignatures(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 4294967311L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<h1:bigint,h2:bigint>>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val pairs = input.asInstanceOf[ArrayData]
    val n = pairs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val row = pairs.getStruct(i, 2)
      val h1 = row.getLong(0)
      val h2 = row.getLong(1)
      var j = 0
      while (j < numHashes) {
        val v = (h1 + j * h2) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box): Array[Any])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val row = ctx.freshName("row")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val rowCls = classOf[InternalRow].getName
      val gadCls = classOf[GenericArrayData].getName
      s"""
         |int $n = $x.numElements();
         |Object[] $out = new Object[$numHashes];
         |if ($n > 0) {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    $rowCls $row = $x.getStruct($i, 2);
         |    long $h1 = $row.getLong(0);
         |    long $h2 = $row.getLong(1);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = ($h1 + $j * $h2) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  for (int $j = 0; $j < $numHashes; $j++) $out[$j] = (Long) $mins[$j];
         |}
         |${ev.value} = new $gadCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatures =
    copy(child = newChild)
}
