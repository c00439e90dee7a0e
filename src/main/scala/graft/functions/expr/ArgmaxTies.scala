package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable buffer for [[ArgmaxTies]]: the running maximum of `n` and ONLY the
  * keys tying it. The buffer is bounded by the tie-set size — i.e. by the
  * size of the ANSWER — never by group cardinality: a non-maximal candidate
  * is either never admitted or evicted the moment a larger `n` arrives.
  */
final class ArgmaxTiesBuffer {
  var has: Boolean = false
  var maxN: Long = 0L
  val keys: scala.collection.mutable.ArrayBuffer[Any] =
    scala.collection.mutable.ArrayBuffer.empty
}

/** Aggregate `argmax_ties(n, key)` → struct(max: bigint, keys: array<K>) —
  * the per-group maximum of `n` together with EVERY key attaining it
  * (`max_by` keeps one arbitrary winner; this keeps the tie set).
  *
  * Exists for streaming argmax-with-ties (SlidingPanes.slidingHotKeysStream,
  * the reference's NEXMark Q5 maxBy stage): the alternatives both violate a
  * scale bound — `collect_list(struct(n, key))` + post-filter buffers ALL
  * keys of a window in one aggregation row (the SURVEY §7.2 M6
  * unbounded-group risk at millions of live keys), and a max-then-self-join
  * runs the upstream stateful stages twice (measured 25% rate cost and 2.6×
  * state rows on the Q5 rung). This accumulator keeps the single-pipeline
  * plan with a buffer bounded by the output itself.
  *
  * Works in streaming aggregations the same way `collect_list` does: the
  * buffer serializes to the state store between micro-batches via
  * `serialize`/`deserialize` (an UnsafeProjection round-trip).
  */
case class ArgmaxTies(n: Expression, key: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgmaxTiesBuffer] {

  override def prettyName: String = "graft_argmax_ties"
  override def children: Seq[Expression] = Seq(n, key)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("max", LongType),
    StructField("keys", ArrayType(key.dataType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (n.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argmax_ties requires a BIGINT ranking column, got ${n.dataType.sql}")

  override def createAggregationBuffer(): ArgmaxTiesBuffer = new ArgmaxTiesBuffer

  override def update(buf: ArgmaxTiesBuffer, input: InternalRow): ArgmaxTiesBuffer = {
    val nv = n.eval(input)
    if (nv == null) return buf
    val v = nv.asInstanceOf[Long]
    if (!buf.has || v > buf.maxN) {
      buf.has = true
      buf.maxN = v
      buf.keys.clear()
      buf.keys += copyKey(key.eval(input))
    } else if (v == buf.maxN) {
      buf.keys += copyKey(key.eval(input))
    }
    buf
  }

  override def merge(buf: ArgmaxTiesBuffer, other: ArgmaxTiesBuffer): ArgmaxTiesBuffer = {
    if (other.has) {
      if (!buf.has || other.maxN > buf.maxN) {
        buf.has = true
        buf.maxN = other.maxN
        buf.keys.clear()
        buf.keys ++= other.keys
      } else if (other.maxN == buf.maxN) {
        buf.keys ++= other.keys
      }
    }
    buf
  }

  override def eval(buf: ArgmaxTiesBuffer): Any =
    if (!buf.has) null
    else new GenericInternalRow(Array[Any](buf.maxN,
      new GenericArrayData(buf.keys.toArray)))

  private def copyKey(k: Any): Any =
    if (k == null) null else InternalRow.copyValue(k)

  @transient private lazy val bufSchema =
    Array[DataType](LongType, ArrayType(key.dataType))
  @transient private lazy val bufProjection = UnsafeProjection.create(bufSchema)

  override def serialize(buf: ArgmaxTiesBuffer): Array[Byte] = {
    val row = new GenericInternalRow(2)
    if (buf.has) {
      row.update(0, buf.maxN)
      row.update(1, new GenericArrayData(buf.keys.toArray))
    } // else both fields stay null → empty buffer marker
    bufProjection.apply(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): ArgmaxTiesBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = new ArgmaxTiesBuffer
    if (!row.isNullAt(1)) {
      buf.has = true
      buf.maxN = row.getLong(0)
      val arr = row.getArray(1)
      val kt = key.dataType
      var i = 0
      while (i < arr.numElements()) {
        buf.keys += (if (arr.isNullAt(i)) null else copyKey(arr.get(i, kt)))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgmaxTies =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgmaxTies =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(n = newChildren(0), key = newChildren(1))
}
