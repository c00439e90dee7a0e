package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import java.io.ByteArrayOutputStream

/** RecordBatch v2 codec pins (the in-sandbox half of the Kafka wire client;
  * the socket half runs in LiveWireSpec against KAFKA_BOOTSTRAP): the fixed
  * batch-header layout byte-by-byte against the published format, zigzag
  * varint vectors from the (protobuf-shared) encoding spec, CRC32C
  * enforcement, multi-batch sets, truncated tails, and control-batch
  * filtering.
  */
class KafkaWireSpec extends AnyFunSuite {

  test("zigzag varints match the published encoding vectors") {
    def enc(v: Long): Seq[Int] = {
      val o = new ByteArrayOutputStream()
      KafkaRecordBatch.writeZigZag(o, v)
      o.toByteArray.map(_ & 0xff).toSeq
    }
    assert(enc(0L) == Seq(0x00))
    assert(enc(-1L) == Seq(0x01))
    assert(enc(1L) == Seq(0x02))
    assert(enc(-2L) == Seq(0x03))
    assert(enc(150L) == Seq(0xac, 0x02)) // zigzag(150)=300 → 0xAC 0x02
    for (v <- Seq(0L, -1L, 1L, 63L, -64L, 64L, 12345678L, Long.MaxValue, Long.MinValue)) {
      val buf = ByteBuffer.wrap({
        val o = new ByteArrayOutputStream(); KafkaRecordBatch.writeZigZag(o, v); o.toByteArray
      })
      assert(KafkaRecordBatch.readZigZag(buf) == v, s"roundtrip $v")
    }
  }

  test("batch header layout matches the published RecordBatch v2 format") {
    val batch = KafkaRecordBatch.encode(
      Seq(("k".getBytes, "v".getBytes)), baseTimestamp = 1000L, baseOffset = 7L)
    val b = ByteBuffer.wrap(batch)
    assert(b.getLong == 7L, "bytes 0-7: base offset")
    val batchLength = b.getInt
    assert(batchLength == batch.length - 12, "bytes 8-11: length of the rest")
    assert(b.getInt == -1, "bytes 12-15: partition leader epoch")
    assert(b.get() == 2.toByte, "byte 16: magic = 2")
    b.getInt // crc
    assert(b.getShort == 0, "attributes: uncompressed, non-transactional")
    assert(b.getInt == 0, "last offset delta for a single record")
    assert(b.getLong == 1000L, "base timestamp")
    assert(b.getLong == 1000L, "max timestamp")
    assert(b.getLong == -1L, "producer id")
    assert(b.getShort == -1, "producer epoch")
    assert(b.getInt == -1, "base sequence")
    assert(b.getInt == 1, "record count")
    assert(batch.length > KafkaRecordBatch.HeaderSize)
  }

  test("round-trip: offsets, null keys, empty and binary values") {
    val records = Seq[(Array[Byte], Array[Byte])](
      ("key1".getBytes, "value1".getBytes),
      (null, "no-key".getBytes),
      ("k3".getBytes, Array.emptyByteArray),
      ("bin".getBytes, Array[Byte](0, -1, 127, -128)))
    val batch = KafkaRecordBatch.encode(records, 123456789L, baseOffset = 100L)
    val out = KafkaRecordBatch.decodeAll(batch)
    assert(out.map(_._1) == Seq(100L, 101L, 102L, 103L), "absolute offsets")
    assert(new String(out(0)._2) == "key1" && new String(out(0)._3) == "value1")
    assert(out(1)._2 == null && new String(out(1)._3) == "no-key")
    assert(out(2)._3.isEmpty)
    assert(out(3)._3.toSeq == Seq[Byte](0, -1, 127, -128))
  }

  test("CRC32C tamper detection") {
    val batch = KafkaRecordBatch.encode(Seq(("k".getBytes, "v".getBytes)), 1L)
    batch(batch.length - 1) = (batch(batch.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](KafkaRecordBatch.decodeAll(batch))
    assert(e.getMessage.contains("CRC mismatch"))
  }

  test("multi-batch sets decode fully; a truncated trailing batch is skipped") {
    val b1 = KafkaRecordBatch.encode(Seq(("a".getBytes, "1".getBytes)), 1L, baseOffset = 0L)
    val b2 = KafkaRecordBatch.encode(Seq(("b".getBytes, "2".getBytes)), 2L, baseOffset = 1L)
    val both = b1 ++ b2
    assert(KafkaRecordBatch.decodeAll(both).map(t => new String(t._3)) == Seq("1", "2"))
    // broker may cut the last batch at max_bytes: the partial tail is dropped
    val truncated = b1 ++ b2.take(b2.length - 5)
    assert(KafkaRecordBatch.decodeAll(truncated).map(t => new String(t._3)) == Seq("1"))
  }

  test("control batches (txn markers) are filtered from decoded records") {
    val batch = KafkaRecordBatch.encode(Seq(("c".getBytes, "marker".getBytes)), 1L)
    // set the control bit (0x20) in attributes and recompute the CRC
    val b = ByteBuffer.wrap(batch)
    val attributesPos = 8 + 4 + 4 + 1 + 4 // offset+len+epoch+magic+crc
    b.putShort(attributesPos, (b.getShort(attributesPos) | 0x20).toShort)
    val section = java.util.Arrays.copyOfRange(batch, attributesPos, batch.length)
    val crc = new java.util.zip.CRC32C()
    crc.update(section)
    b.putInt(attributesPos - 4, crc.getValue.toInt)
    assert(KafkaRecordBatch.decodeAll(batch).isEmpty,
      "a control batch carries no user records")
  }
}
