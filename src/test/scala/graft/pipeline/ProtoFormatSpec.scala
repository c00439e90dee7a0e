package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Schema-driven protobuf wire codec (reference: extensions/protobuf/.../
  * ProtobufSerializer.java; encoding per the public wire spec): scalar
  * round-trips incl. varint edges, null omission, nested messages, repeated
  * fields, unknown-field skipping, and interop with the hand-rolled
  * [[graft.grpc.ProtoLite]] single-string message.
  */
class ProtoFormatSpec extends SparkSpec {

  private val scalarSchema = StructType(Seq(
    StructField("s", StringType),
    StructField("l", LongType),
    StructField("i", IntegerType),
    StructField("b", BooleanType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("bin", BinaryType)))

  test("scalar round-trip incl. varint edges, negative values, NaN bits, UTF-8") {
    val rows = Seq(
      Row("héllo ☃", 0L, 0, false, 0.0, 0.0f, Array[Byte](1, 2, 3)),
      Row("", 127L, 128, true, -1.5, Float.MaxValue, Array.emptyByteArray),
      Row("x", Long.MaxValue, Int.MinValue, true, Double.NaN, -0.0f, Array[Byte](-1)),
      Row("neg", -1L, -42, false, Double.MinPositiveValue, 1.25f, Array[Byte](0)))
    for (r <- rows) {
      val back = ProtoFormat.decodeRow(scalarSchema, ProtoFormat.encodeRow(scalarSchema, r))
      assert(back.getString(0) == r.getString(0))
      assert(back.getLong(1) == r.getLong(1))
      assert(back.getInt(2) == r.getInt(2))
      assert(back.getBoolean(3) == r.getBoolean(3))
      val (d0, d1) = (r.getDouble(4), back.getDouble(4))
      assert(java.lang.Double.doubleToLongBits(d0) == java.lang.Double.doubleToLongBits(d1),
        "doubles round-trip bit-exactly (incl. NaN)")
      assert(back.getFloat(5) == r.getFloat(5) ||
        (r.getFloat(5).isNaN && back.getFloat(5).isNaN))
      assert(back.getAs[Array[Byte]](6).toSeq == r.getAs[Array[Byte]](6).toSeq)
    }
  }

  test("null fields are omitted on the wire and decode back to null") {
    val r = Row(null, 7L, null, true, null, null, null)
    val bytes = ProtoFormat.encodeRow(scalarSchema, r)
    val back = ProtoFormat.decodeRow(scalarSchema, bytes)
    assert(back.isNullAt(0) && back.isNullAt(2) && back.isNullAt(4) &&
      back.isNullAt(5) && back.isNullAt(6))
    assert(back.getLong(1) == 7L && back.getBoolean(3))
    // an all-null row is the empty message
    assert(ProtoFormat.encodeRow(scalarSchema, Row(null, null, null, null, null, null, null)).isEmpty)
  }

  test("nested messages and repeated fields round-trip") {
    val inner = StructType(Seq(
      StructField("name", StringType), StructField("v", LongType)))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("sub", inner),
      StructField("tags", ArrayType(StringType)),
      StructField("nums", ArrayType(LongType))))
    val r = Row(5L, Row("in", 9L), Seq("a", "b", "c"), Seq(1L, -2L, 300L))
    val back = ProtoFormat.decodeRow(schema, ProtoFormat.encodeRow(schema, r))
    assert(back.getLong(0) == 5L)
    assert(back.getStruct(1) == Row("in", 9L))
    assert(back.getSeq[String](2) == Seq("a", "b", "c"))
    assert(back.getSeq[Long](3) == Seq(1L, -2L, 300L))
  }

  test("timestamps (micros) and dates (epoch days) round-trip") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("d", DateType)))
    val ts = java.sql.Timestamp.valueOf("2026-03-01 10:20:30.123456")
    val d = java.sql.Date.valueOf("1999-12-31")
    val back = ProtoFormat.decodeRow(schema, ProtoFormat.encodeRow(schema, Row(ts, d)))
    assert(back.getTimestamp(0) == ts)
    assert(back.getDate(1).toString == "1999-12-31")
  }

  test("unknown field numbers are skipped by wire type (forward compatibility)") {
    val wide = StructType(Seq(
      StructField("a", StringType), StructField("b", LongType),
      StructField("x", DoubleType), StructField("y", StringType)))
    val narrow = StructType(Seq(
      StructField("a", StringType), StructField("b", LongType)))
    val bytes = ProtoFormat.encodeRow(wide, Row("keep", 42L, 3.5, "drop"))
    val back = ProtoFormat.decodeRow(narrow, bytes)
    assert(back == Row("keep", 42L))
  }

  test("interop: ProtoLite's string message is field-1 of this codec") {
    val schema = StructType(Seq(StructField("payload", StringType)))
    val viaLite = graft.grpc.ProtoLite.encodeString("wire-compatible ✓")
    assert(ProtoFormat.decodeRow(schema, viaLite) == Row("wire-compatible ✓"))
    val viaFormat = ProtoFormat.encodeRow(schema, Row("wire-compatible ✓"))
    assert(graft.grpc.ProtoLite.decodeString(viaFormat) == "wire-compatible ✓")
  }

  test("dataset boundary + length-prefixed files: distributed encode/decode") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"name$i", i * 1.5)).toDF("id", "name", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft_pb_files_").toString
    ProtoFormat.writeFiles(df.repartition(4), dir)
    val back = ProtoFormat.readFiles(spark, dir, df.schema)
    assert(back.rdd.getNumPartitions >= 1)
    val rows = back.as[(Long, String, Double)].collect().sortBy(_._1)
    assert(rows.toSeq == (1 to 500).map(i => (i.toLong, s"name$i", i * 1.5)))
    // binary column boundary too
    val bin = ProtoFormat.encode(df)
    assert(bin.schema.fieldNames.toSeq == Seq("proto"))
    val decoded = ProtoFormat.decode(bin, df.schema).as[(Long, String, Double)]
      .collect().sortBy(_._1)
    assert(decoded.toSeq == rows.toSeq)
  }
}
