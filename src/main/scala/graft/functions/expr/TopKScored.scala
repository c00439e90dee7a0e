package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable buffer for [[TopKScored]]: at most k (score, id) pairs kept in
  * rank order — parallel primitive arrays, never an allocation per row once
  * warm. Bounded by k regardless of group cardinality.
  */
final class TopKScoredBuffer(val k: Int) {
  var size: Int = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
}

/** Aggregate `graft_topk(score, id, k)` → array<struct<score: double,
  * id: bigint>> — the k best (score, id) pairs of the group in rank order,
  * ordered by (score quantized to 9 dp DESC, id ASC).
  *
  * Exists for IN-STREAM top-k ranking (the sharded ANN serving plan,
  * q165): after the probe/candidate stream-static join fans each query out
  * to its candidate rows, the per-query ranking must happen inside the
  * streaming query — a window-function `row_number` is not available on
  * streams, and `collect_list` + post-sort buffers the whole candidate set
  * per group (the SURVEY §7.2 M6 unbounded-group risk). This buffer is k
  * pairs, i.e. answer-sized, like [[ArgmaxTies]].
  *
  * The 9-dp quantization (BigDecimal HALF_UP — identical to the serving
  * loops' `quant9` and DuckDB's `round(x, 9)`) makes the rank order
  * engine-comparable: raw double comparison would make the rank depend on
  * sub-9dp bits the differential oracle deliberately rounds away. The
  * OUTPUT score stays the raw double.
  *
  * Streaming-state safe: serialize/deserialize round-trips the bounded
  * buffer through an UnsafeProjection like ArgmaxTies.
  */
case class TopKScored(score: Expression, id: Expression, kExpr: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKScoredBuffer] {

  override def prettyName: String = "graft_topk"
  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType),
    StructField("id", LongType))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires a DOUBLE score, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires a BIGINT id, got ${id.dataType.sql}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_topk requires a literal INT k")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires k > 0, got ${kExpr.eval()}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  /** rank order: quant9(score) DESC, id ASC; < 0 = (s1,i1) ranks earlier.
    * quant9Long is the same 9-dp HALF_UP value as a primitive (identical
    * ordering, no BigDecimal allocation per comparison — the r18 hot-path
    * fix the 1000× serving profile asked for).
    */
  private def cmp(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val c = java.lang.Long.compare(
      graft.functions.SimilarityFunctions.quant9Long(s2),
      graft.functions.SimilarityFunctions.quant9Long(s1))
    if (c != 0) c else java.lang.Long.compare(i1, i2)
  }

  override def createAggregationBuffer(): TopKScoredBuffer = new TopKScoredBuffer(k)

  private def insert(buf: TopKScoredBuffer, s: Double, i: Long): Unit = {
    if (buf.size == buf.k &&
        cmp(s, i, buf.scores(buf.size - 1), buf.ids(buf.size - 1)) >= 0) return
    // find slot (k is small — linear scan; every admitted row shifts <= k)
    var pos = 0
    while (pos < buf.size && cmp(s, i, buf.scores(pos), buf.ids(pos)) >= 0) pos += 1
    val last = math.min(buf.size, buf.k - 1)
    var j = last
    while (j > pos) { buf.scores(j) = buf.scores(j - 1); buf.ids(j) = buf.ids(j - 1); j -= 1 }
    buf.scores(pos) = s
    buf.ids(pos) = i
    if (buf.size < buf.k) buf.size += 1
  }

  override def update(buf: TopKScoredBuffer, input: InternalRow): TopKScoredBuffer = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      insert(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKScoredBuffer, other: TopKScoredBuffer): TopKScoredBuffer = {
    var j = 0
    while (j < other.size) { insert(buf, other.scores(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKScoredBuffer): Any = {
    val rows = new Array[Any](buf.size)
    var j = 0
    while (j < buf.size) {
      rows(j) = new GenericInternalRow(Array[Any](buf.scores(j), buf.ids(j)))
      j += 1
    }
    new GenericArrayData(rows)
  }

  @transient private lazy val bufProjection = UnsafeProjection.create(
    Array[DataType](ArrayType(DoubleType), ArrayType(LongType)))

  override def serialize(buf: TopKScoredBuffer): Array[Byte] = {
    val row = new GenericInternalRow(2)
    row.update(0, new GenericArrayData(buf.scores.take(buf.size)))
    row.update(1, new GenericArrayData(buf.ids.take(buf.size)))
    bufProjection.apply(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): TopKScoredBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = new TopKScoredBuffer(k)
    val ss = row.getArray(0).toDoubleArray()
    val is = row.getArray(1).toLongArray()
    var j = 0
    while (j < ss.length) {
      buf.scores(j) = ss(j); buf.ids(j) = is(j); j += 1
    }
    buf.size = ss.length
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKScored =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKScored =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
