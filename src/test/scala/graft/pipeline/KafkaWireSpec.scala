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

  // ---------------------------------------- flexible (KIP-482) encodings

  private def uvarint(v: Int): Seq[Int] = {
    val o = new ByteArrayOutputStream()
    KafkaWire.writeUVarint(o, v)
    o.toByteArray.map(_ & 0xff).toSeq
  }

  test("unsigned varints match the published encoding vectors (not zigzag)") {
    assert(uvarint(0) == Seq(0x00))
    assert(uvarint(1) == Seq(0x01))
    assert(uvarint(127) == Seq(0x7f))
    assert(uvarint(128) == Seq(0x80, 0x01))
    assert(uvarint(300) == Seq(0xac, 0x02))
    assert(uvarint(16384) == Seq(0x80, 0x80, 0x01))
    for (v <- Seq(0, 1, 127, 128, 300, 16383, 16384, 1 << 21, Int.MaxValue)) {
      val o = new ByteArrayOutputStream()
      KafkaWire.writeUVarint(o, v)
      assert(KafkaWire.readUVarint(ByteBuffer.wrap(o.toByteArray)) == v, s"roundtrip $v")
    }
    // a malformed varint with >5 continuation bytes must fail loudly, not
    // wrap mod-32 into a corrupt length that misparses the rest of the frame
    val malformed = Array.fill[Byte](6)(0x80.toByte) :+ 0x01.toByte
    val e = intercept[IllegalArgumentException] {
      KafkaWire.readUVarint(ByteBuffer.wrap(malformed))
    }
    assert(e.getMessage.contains("malformed unsigned varint"))
    // 5 bytes (the Int.MaxValue width) still parses
    val five = new ByteArrayOutputStream()
    KafkaWire.writeUVarint(five, Int.MaxValue)
    assert(five.toByteArray.length == 5)
  }

  test("compact strings/bytes/arrays encode length+1 with 0 as null") {
    val o = new ByteArrayOutputStream()
    KafkaWire.writeCompactString(o, "t")
    assert(o.toByteArray.map(_ & 0xff).toSeq == Seq(0x02, 't'.toInt),
      "COMPACT_STRING: varint(len+1) then bytes")
    val n = new ByteArrayOutputStream()
    KafkaWire.writeCompactNullableString(n, null)
    assert(n.toByteArray.toSeq == Seq[Byte](0x00), "null encodes as 0")
    val e = new ByteArrayOutputStream()
    KafkaWire.writeCompactString(e, "")
    assert(e.toByteArray.toSeq == Seq[Byte](0x01), "empty string is len+1 = 1")
    val b = new ByteArrayOutputStream()
    KafkaWire.writeCompactBytes(b, Array[Byte](9, 8))
    assert(b.toByteArray.toSeq == Seq[Byte](0x03, 9, 8))
    assert(KafkaWire.readCompactBytes(ByteBuffer.wrap(Array[Byte](0x00))) == null)
    val a = new ByteArrayOutputStream()
    KafkaWire.writeCompactArrayLen(a, 1)
    assert(a.toByteArray.toSeq == Seq[Byte](0x02), "COMPACT_ARRAY count+1")
    assert(KafkaWire.readCompactString(
      ByteBuffer.wrap(Array[Byte](0x06, 't', 'o', 'p', 'i', 'c'))) == "topic")
  }

  test("tagged-field sections: empty on write, skipped with payloads on read") {
    val o = new ByteArrayOutputStream()
    KafkaWire.writeEmptyTags(o)
    assert(o.toByteArray.toSeq == Seq[Byte](0x00), "no tags = single 0x00")
    // two tagged fields (tag 0 size 2, tag 5 size 1) then a sentinel short
    val buf = ByteBuffer.wrap(Array[Byte](
      0x02, 0x00, 0x02, 0x11, 0x22, 0x05, 0x01, 0x33, 0x7a, 0x7b))
    KafkaWire.skipTags(buf)
    assert(buf.getShort == 0x7a7b, "reader resumes exactly after the tag section")
  }

  test("request header v2 = v1 + tagged fields; client id stays legacy string") {
    val v1 = KafkaWire.requestHeader(3, 4, 42, "graft", flexible = false)
    val v2 = KafkaWire.requestHeader(3, 9, 42, "graft", flexible = true)
    val b1 = ByteBuffer.wrap(v1)
    assert(b1.getShort == 3 && b1.getShort == 4 && b1.getInt == 42)
    assert(b1.getShort == 5, "legacy nullable-string length for client id")
    assert(v2.length == v1.length + 1 && v2.last == 0x00,
      "header v2 appends only the empty tag section (KIP-482)")
    val b2 = ByteBuffer.wrap(v2)
    assert(b2.getShort == 3 && b2.getShort == 9)
  }

  test("Metadata v9 request body pins the compact layout byte-by-byte") {
    val body = KafkaWire.metadataV9Request("t")
    assert(body.map(_ & 0xff).toSeq == Seq(
      0x02,       // compact topics array: count 1 (+1)
      0x02, 't'.toInt, // compact topic name "t"
      0x00,       // per-topic tagged fields
      0x01,       // allow_auto_topic_creation = true
      0x00,       // include_cluster_authorized_operations
      0x00,       // include_topic_authorized_operations
      0x00))      // tagged fields
  }

  test("Produce v9 request body pins the compact layout around the batch") {
    val batch = Array[Byte](1, 2, 3)
    val body = KafkaWire.produceV9Request("t", 7, batch)
    val b = body.map(_ & 0xff).toSeq
    assert(b == Seq(
      0x00,                   // transactional_id = null (compact)
      0xff, 0xff,             // acks = -1
      0x00, 0x00, 0x75, 0x30, // timeout 30000
      0x02,                   // topics: 1
      0x02, 't'.toInt,        // name
      0x02,                   // partitions: 1
      0x00, 0x00, 0x00, 0x07, // index 7
      0x04, 1, 2, 3,          // compact records: len 3 (+1) then batch
      0x00, 0x00, 0x00))      // partition, topic, request tag sections
  }

  test("Fetch v12 request body: sessionless compact layout") {
    val body = KafkaWire.fetchV12Request("t", 0, 5L, 500)
    val b = ByteBuffer.wrap(body)
    assert(b.getInt == -1, "replica_id")
    assert(b.getInt == 500, "max_wait")
    assert(b.getInt == 1, "min_bytes")
    assert(b.getInt == (16 << 20), "max_bytes")
    assert(b.get() == 1, "isolation_level read_committed")
    assert(b.getInt == 0, "session_id 0")
    assert(b.getInt == -1, "session_epoch -1 disables fetch sessions")
    assert(KafkaWire.readCompactArrayLen(b) == 1, "one topic")
    assert(KafkaWire.readCompactString(b) == "t")
    assert(KafkaWire.readCompactArrayLen(b) == 1, "one partition")
    assert(b.getInt == 0, "partition")
    assert(b.getInt == -1, "current_leader_epoch")
    assert(b.getLong == 5L, "fetch_offset")
    assert(b.getInt == -1, "last_fetched_epoch")
    assert(b.getLong == -1L, "log_start_offset")
    assert(b.getInt == (8 << 20), "partition_max_bytes")
    KafkaWire.skipTags(b); KafkaWire.skipTags(b)
    assert(KafkaWire.readCompactArrayLen(b) == 0, "no forgotten topics")
    assert(KafkaWire.readCompactString(b) == "", "rack_id")
    KafkaWire.skipTags(b)
    assert(!b.hasRemaining, "no trailing bytes")
  }

  test("ListOffsets v2/v6 request bodies + response parsers") {
    // v2 (non-flexible): replica_id, isolation, topics [name, partitions
    // [partition, timestamp]]
    val v2 = ByteBuffer.wrap(KafkaWire.listOffsetsV2Request("t", 3, -1L))
    assert(v2.getInt == -1 && v2.get() == 1)
    assert(v2.getInt == 1 && KafkaWire.readString(v2) == "t")
    assert(v2.getInt == 1 && v2.getInt == 3 && v2.getLong == -1L)
    assert(!v2.hasRemaining)
    // v6 (flexible): + current_leader_epoch, compact layout, tag sections
    val v6 = ByteBuffer.wrap(KafkaWire.listOffsetsV6Request("t", 3, -2L))
    assert(v6.getInt == -1 && v6.get() == 1)
    assert(KafkaWire.readCompactArrayLen(v6) == 1)
    assert(KafkaWire.readCompactString(v6) == "t")
    assert(KafkaWire.readCompactArrayLen(v6) == 1)
    assert(v6.getInt == 3 && v6.getInt == -1 && v6.getLong == -2L)
    KafkaWire.skipTags(v6); KafkaWire.skipTags(v6); KafkaWire.skipTags(v6)
    assert(!v6.hasRemaining)

    // v2 response: throttle, topics [name, partitions [partition, err,
    // timestamp, offset]]
    val r2 = new ByteArrayOutputStream()
    val r2d = new java.io.DataOutputStream(r2)
    r2d.writeInt(0); r2d.writeInt(1)
    KafkaWire.writeString(r2d, "t")
    r2d.writeInt(1); r2d.writeInt(3); r2d.writeShort(0)
    r2d.writeLong(-1L); r2d.writeLong(42L)
    assert(KafkaWire.parseListOffsetsV2(ByteBuffer.wrap(r2.toByteArray)) == (0, 42L))
    // v6 response: + leader_epoch and tag sections, compact layout
    val r6 = new ByteArrayOutputStream()
    val r6d = new java.io.DataOutputStream(r6)
    r6d.writeInt(0)
    KafkaWire.writeCompactArrayLen(r6, 1)
    KafkaWire.writeCompactString(r6, "t")
    KafkaWire.writeCompactArrayLen(r6, 1)
    r6d.writeInt(3); r6d.writeShort(0); r6d.writeLong(-1L); r6d.writeLong(42L)
    r6d.writeInt(0)
    KafkaWire.writeEmptyTags(r6); KafkaWire.writeEmptyTags(r6); KafkaWire.writeEmptyTags(r6)
    assert(KafkaWire.parseListOffsetsV6(ByteBuffer.wrap(r6.toByteArray)) == (0, 42L))
  }

  test("flexible response parsers round-trip hand-encoded broker responses") {
    // ApiVersions v3 (after the error short): compact api_keys + throttle + tags
    val av = new ByteArrayOutputStream()
    val avd = new java.io.DataOutputStream(av)
    KafkaWire.writeCompactArrayLen(av, 2)
    avd.writeShort(0); avd.writeShort(0); avd.writeShort(9); KafkaWire.writeEmptyTags(av)
    avd.writeShort(1); avd.writeShort(0); avd.writeShort(13); KafkaWire.writeEmptyTags(av)
    avd.writeInt(0); KafkaWire.writeEmptyTags(av)
    assert(KafkaWire.parseApiVersionsV3(ByteBuffer.wrap(av.toByteArray)) ==
      Map(0 -> (0, 9), 1 -> (0, 13)))

    // Metadata v9: one broker, one topic, one healthy partition led by it
    val md = new ByteArrayOutputStream()
    val mdd = new java.io.DataOutputStream(md)
    mdd.writeInt(0) // throttle
    KafkaWire.writeCompactArrayLen(md, 1) // brokers
    mdd.writeInt(5); KafkaWire.writeCompactString(md, "h1"); mdd.writeInt(9092)
    KafkaWire.writeCompactNullableString(md, null); KafkaWire.writeEmptyTags(md)
    KafkaWire.writeCompactNullableString(md, "cid")
    mdd.writeInt(5) // controller
    KafkaWire.writeCompactArrayLen(md, 1) // topics
    mdd.writeShort(0); KafkaWire.writeCompactString(md, "t"); md.write(0)
    KafkaWire.writeCompactArrayLen(md, 1) // partitions
    mdd.writeShort(0); mdd.writeInt(0); mdd.writeInt(5); mdd.writeInt(3)
    KafkaWire.writeCompactArrayLen(md, 1); mdd.writeInt(5) // replicas
    KafkaWire.writeCompactArrayLen(md, 1); mdd.writeInt(5) // isr
    KafkaWire.writeCompactArrayLen(md, 0) // offline
    KafkaWire.writeEmptyTags(md)
    mdd.writeInt(0); KafkaWire.writeEmptyTags(md) // topic_authorized_ops + tags
    mdd.writeInt(0); KafkaWire.writeEmptyTags(md) // cluster_authorized_ops + tags
    assert(KafkaWire.parseMetadataV9(ByteBuffer.wrap(md.toByteArray)) ==
      (0, Seq((0, "h1", 9092))))

    // Produce v9: one topic/partition, base offset 41
    val pr = new ByteArrayOutputStream()
    val prd = new java.io.DataOutputStream(pr)
    KafkaWire.writeCompactArrayLen(pr, 1)
    KafkaWire.writeCompactString(pr, "t")
    KafkaWire.writeCompactArrayLen(pr, 1)
    prd.writeInt(0); prd.writeShort(0); prd.writeLong(41L)
    prd.writeLong(-1L); prd.writeLong(0L)
    KafkaWire.writeCompactArrayLen(pr, 0) // record_errors
    KafkaWire.writeCompactNullableString(pr, null)
    KafkaWire.writeEmptyTags(pr); KafkaWire.writeEmptyTags(pr)
    prd.writeInt(0); KafkaWire.writeEmptyTags(pr)
    assert(KafkaWire.parseProduceV9(ByteBuffer.wrap(pr.toByteArray)) == (0, 41L))

    // Fetch v12: one topic/partition, a record set with one batch
    val recordSet = KafkaRecordBatch.encode(Seq(("k".getBytes, "v".getBytes)), 1L)
    val fr = new ByteArrayOutputStream()
    val frd = new java.io.DataOutputStream(fr)
    frd.writeInt(0) // throttle
    frd.writeShort(0) // top-level error
    frd.writeInt(123) // session_id
    KafkaWire.writeCompactArrayLen(fr, 1)
    KafkaWire.writeCompactString(fr, "t")
    KafkaWire.writeCompactArrayLen(fr, 1)
    frd.writeInt(0); frd.writeShort(0); frd.writeLong(10L)
    frd.writeLong(10L); frd.writeLong(0L)
    KafkaWire.writeCompactArrayLen(fr, 0) // aborted
    frd.writeInt(-1) // preferred_read_replica
    KafkaWire.writeCompactBytes(fr, recordSet)
    KafkaWire.writeEmptyTags(fr); KafkaWire.writeEmptyTags(fr); KafkaWire.writeEmptyTags(fr)
    val (err, hw, rs) = KafkaWire.parseFetchV12(ByteBuffer.wrap(fr.toByteArray))
    assert(err == 0 && hw == 10L)
    assert(KafkaRecordBatch.decodeAll(rs).map(t => new String(t._3)) == Seq("v"))
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

  // ------------------------------------------------------------------ SASL

  test("SASL PLAIN auth bytes match RFC 4616's example") {
    // RFC 4616 example: authcid tim, passwd tanstaaftanstaaf, no authzid
    val b = KafkaSasl.plainAuthBytes("tim", "tanstaaftanstaaf")
    assert(java.util.Base64.getEncoder.encodeToString(b) ==
      "AHRpbQB0YW5zdGFhZnRhbnN0YWFm")
  }

  test("SCRAM-SHA-256 client reproduces RFC 7677's published exchange byte-for-byte") {
    val c = new KafkaSasl.ScramClient("user", "pencil", "rOprNGfwEbeRWgbNEkqO")
    assert(c.clientFirstMessage == "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    assert(c.clientFinalMessage(serverFirst) ==
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    // mutual auth: the RFC's server-final verifies; a tampered one throws
    c.verifyServerFinal("v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    intercept[IllegalArgumentException] {
      c.verifyServerFinal("v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G5=")
    }
    intercept[IllegalStateException] {
      c.verifyServerFinal("e=invalid-proof")
    }
  }

  test("SCRAM guards: nonce reflection, low iteration count, saslname escaping") {
    // a server nonce that does not EXTEND the client nonce is a reflection
    val c1 = new KafkaSasl.ScramClient("u", "p", "abc")
    intercept[IllegalArgumentException] {
      c1.clientFinalMessage("r=abc,s=c2FsdA==,i=4096") // identical, no extension
    }
    intercept[IllegalArgumentException] {
      new KafkaSasl.ScramClient("u", "p", "abc")
        .clientFinalMessage("r=xyz123,s=c2FsdA==,i=4096") // different prefix
    }
    // iteration count below the RFC 7677 minimum is refused
    intercept[IllegalArgumentException] {
      new KafkaSasl.ScramClient("u", "p", "abc")
        .clientFinalMessage("r=abcdef,s=c2FsdA==,i=1024")
    }
    // = and , in usernames escape per RFC 5802 saslname
    assert(new KafkaSasl.ScramClient("a=b,c", "p", "n").clientFirstBare ==
      "n=a=3Db=2Cc,r=n")
    // without SASLprep, non-ASCII credentials are rejected loudly
    intercept[IllegalArgumentException] {
      new KafkaSasl.ScramClient("ué", "p", "n")
    }
  }

  test("SaslHandshake v1 / SaslAuthenticate v0 bodies pin the layouts; parsers round-trip") {
    // handshake body = legacy string mechanism
    assert(KafkaWire.saslHandshakeV1Request("PLAIN").map(_ & 0xff).toSeq ==
      Seq(0x00, 0x05, 'P', 'L', 'A', 'I', 'N').map(_.toInt))
    // authenticate body = int32-prefixed auth bytes
    assert(KafkaWire.saslAuthenticateV0Request(Array[Byte](1, 2, 3)).map(_ & 0xff).toSeq ==
      Seq(0, 0, 0, 3, 1, 2, 3))
    // handshake response: err + mechanisms array
    val hs = new ByteArrayOutputStream()
    val hsd = new java.io.DataOutputStream(hs)
    hsd.writeShort(0); hsd.writeInt(2)
    KafkaWire.writeString(hsd, "PLAIN"); KafkaWire.writeString(hsd, "SCRAM-SHA-256")
    assert(KafkaWire.parseSaslHandshakeV1(ByteBuffer.wrap(hs.toByteArray)) ==
      (0, Seq("PLAIN", "SCRAM-SHA-256")))
    // authenticate response: err + nullable message + auth bytes
    val au = new ByteArrayOutputStream()
    val aud = new java.io.DataOutputStream(au)
    aud.writeShort(58); KafkaWire.writeString(aud, "bad creds")
    aud.writeInt(2); au.write(Array[Byte](7, 8))
    val (err, msg, tok) = KafkaWire.parseSaslAuthenticateV0(ByteBuffer.wrap(au.toByteArray))
    assert(err == 58 && msg.contains("bad creds") && tok.toSeq == Seq[Byte](7, 8))
  }

  // ---- stub SASL broker: enforces handshake + authenticate before serving
  // ApiVersions, so the socket tests below drive KafkaWire's REAL auth path
  // (same frames a SASL_PLAINTEXT / SASL_SSL listener would see).

  private def hmac(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data)
  }
  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
  private def utf8(b: Array[Byte]): String = new String(b, "UTF-8")

  /** Handles ONE connection: SaslHandshake → SaslAuthenticate round(s) →
    * one ApiVersions v3; rejects data APIs before authentication completes.
    */
  private def serveSaslConn(sock: java.net.Socket, mech: String,
                            user: String, pass: String): Unit = {
    val in = new java.io.DataInputStream(sock.getInputStream)
    val out = new java.io.DataOutputStream(sock.getOutputStream)
    def respond(corr: Int)(body: ByteArrayOutputStream => Unit): Unit = {
      val b = new ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(b)
      d.writeInt(corr)
      body(b)
      out.writeInt(b.size()); out.write(b.toByteArray); out.flush()
    }
    var authed = false
    var done = false
    val salt = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    var scramCtx: Option[(String, String)] = None // (clientFirstBare, serverFirst)
    while (!done) {
      val size = in.readInt()
      val frame = new Array[Byte](size)
      in.readFully(frame)
      val buf = ByteBuffer.wrap(frame)
      val apiKey = buf.getShort
      val version = buf.getShort
      val corr = buf.getInt
      val cidLen = buf.getShort
      buf.position(buf.position() + cidLen)
      if (apiKey == 18 && version >= 3) KafkaWire.skipTags(buf) // flexible header
      apiKey match {
        case 17 =>
          val mlen = buf.getShort
          val mb = new Array[Byte](mlen); buf.get(mb)
          val ok = utf8(mb) == mech
          respond(corr) { o =>
            val d = new java.io.DataOutputStream(o)
            d.writeShort(if (ok) 0 else 33) // UNSUPPORTED_SASL_MECHANISM
            d.writeInt(1); KafkaWire.writeString(d, mech)
          }
        case 36 =>
          val tlen = buf.getInt
          val tok = new Array[Byte](tlen); buf.get(tok)
          def authResp(err: Int, bytes: Array[Byte]): Unit = respond(corr) { o =>
            val d = new java.io.DataOutputStream(o)
            d.writeShort(err); d.writeShort(-1) // null error_message
            d.writeInt(bytes.length); d.write(bytes)
          }
          mech match {
            case "PLAIN" =>
              val parts = utf8(tok).split("\u0000", -1)
              val ok = parts.length == 3 && parts(1) == user && parts(2) == pass
              authed = ok
              authResp(if (ok) 0 else 58, Array.emptyByteArray)
            case "SCRAM-SHA-256" => scramCtx match {
              case None =>
                val bare = utf8(tok).stripPrefix("n,,")
                val cnonce = bare.split(",").find(_.startsWith("r=")).get.substring(2)
                val sf = s"r=${cnonce}SRVNONCE," +
                  s"s=${java.util.Base64.getEncoder.encodeToString(salt)},i=4096"
                scramCtx = Some((bare, sf))
                authResp(0, sf.getBytes("UTF-8"))
              case Some((bare, sf)) =>
                val fin = utf8(tok)
                val withoutProof = fin.substring(0, fin.indexOf(",p="))
                val proof = java.util.Base64.getDecoder.decode(
                  fin.substring(fin.indexOf(",p=") + 3))
                val authMsg = (bare + "," + sf + "," + withoutProof).getBytes("UTF-8")
                val sp = KafkaSasl.hi(pass, salt, 4096)
                val storedKey = sha256(hmac(sp, "Client Key".getBytes("UTF-8")))
                val clientSig = hmac(storedKey, authMsg)
                val recovered = proof.zip(clientSig).map { case (a, b) => (a ^ b).toByte }
                val ok = java.util.Arrays.equals(sha256(recovered), storedKey)
                authed = ok
                if (ok) {
                  val v = "v=" + java.util.Base64.getEncoder.encodeToString(
                    hmac(hmac(sp, "Server Key".getBytes("UTF-8")), authMsg))
                  authResp(0, v.getBytes("UTF-8"))
                } else authResp(58, Array.emptyByteArray)
            }
          }
        case 18 =>
          assert(authed, "stub broker: data API before SASL authentication")
          respond(corr) { o =>
            val d = new java.io.DataOutputStream(o)
            d.writeShort(0)
            KafkaWire.writeCompactArrayLen(o, 1)
            d.writeShort(0); d.writeShort(0); d.writeShort(9); KafkaWire.writeEmptyTags(o)
            d.writeInt(0); KafkaWire.writeEmptyTags(o)
          }
          done = true
      }
    }
  }

  private def withStubBroker(mech: String, user: String, pass: String,
                             tlsKeystore: Option[java.nio.file.Path] = None)
                            (body: Int => Unit): Unit = {
    val server: java.net.ServerSocket = tlsKeystore match {
      case None => new java.net.ServerSocket(0)
      case Some(ks) =>
        val kmf = javax.net.ssl.KeyManagerFactory.getInstance("SunX509")
        val store = java.security.KeyStore.getInstance("PKCS12")
        val fin = java.nio.file.Files.newInputStream(ks)
        try store.load(fin, "changeit".toCharArray) finally fin.close()
        kmf.init(store, "changeit".toCharArray)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(kmf.getKeyManagers, null, null)
        ctx.getServerSocketFactory.createServerSocket(0)
    }
    @volatile var serverErr: Option[Throwable] = None
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        try serveSaslConn(sock, mech, user, pass) finally sock.close()
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.setDaemon(true); t.start()
    try body(server.getLocalPort)
    finally { server.close(); t.join(10000) }
    // peer-close during teardown is a normal end: the client closes failed-
    // auth sockets immediately (the r14 leak fix), so the stub's blocking
    // read ends in EOF/SocketException rather than a clean loop exit
    serverErr.filterNot(e => e.isInstanceOf[java.net.SocketException] ||
      e.isInstanceOf[java.io.EOFException]).foreach(throw _)
  }

  test("SASL_PLAINTEXT: KafkaWire authenticates SCRAM-SHA-256 end-to-end before ApiVersions") {
    withStubBroker("SCRAM-SHA-256", "alice", "alice-secret") { port =>
      val k = new KafkaWire(s"localhost:$port",
        security = KafkaSecurity.saslScramSha256("alice", "alice-secret"))
      try assert(k.apiVersions() == Map(0 -> (0, 9))) finally k.close()
    }
  }

  test("SASL_PLAINTEXT: wrong SCRAM password fails loudly at the client") {
    withStubBroker("SCRAM-SHA-256", "alice", "alice-secret") { port =>
      val k = new KafkaWire(s"localhost:$port",
        security = KafkaSecurity.saslScramSha256("alice", "wrong"))
      try {
        val e = intercept[IllegalArgumentException](k.apiVersions())
        assert(e.getMessage.contains("SASL SCRAM-SHA-256 authentication failed"))
      } finally k.close()
    }
  }

  test("SASL_PLAINTEXT: PLAIN round-trips; a mechanism the broker lacks names the supported set") {
    withStubBroker("PLAIN", "bob", "bob-secret") { port =>
      val k = new KafkaWire(s"localhost:$port",
        security = KafkaSecurity.saslPlain("bob", "bob-secret"))
      try assert(k.apiVersions() == Map(0 -> (0, 9))) finally k.close()
    }
    withStubBroker("PLAIN", "bob", "bob-secret") { port =>
      val k = new KafkaWire(s"localhost:$port",
        security = KafkaSecurity.saslScramSha256("bob", "bob-secret"))
      try {
        val e = intercept[IllegalArgumentException](k.apiVersions())
        assert(e.getMessage.contains("broker supports: PLAIN"))
      } finally k.close()
    }
  }

  test("SASL_SSL: TLS handshake (self-signed, insecure trust) + PLAIN auth over the wire") {
    // self-signed server cert via the JDK's own keytool — no extra jars
    val ks = java.nio.file.Files.createTempDirectory("graft_tls").resolve("server.p12")
    val keytool = System.getProperty("java.home") + "/bin/keytool"
    val cmd = Array(keytool, "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-dname", "CN=localhost",
      "-storepass", "changeit", "-keypass", "changeit",
      "-keystore", ks.toString, "-storetype", "PKCS12")
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    assume(proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) && proc.exitValue == 0,
      "keytool unavailable — cannot mint a test certificate")
    withStubBroker("PLAIN", "carol", "carol-secret", tlsKeystore = Some(ks)) { port =>
      val k = new KafkaWire(s"localhost:$port",
        security = KafkaSecurity.saslPlain("carol", "carol-secret",
          tls = true, tlsInsecure = true))
      try assert(k.apiVersions() == Map(0 -> (0, 9))) finally k.close()
    }
  }
}
