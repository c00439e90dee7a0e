package graft.pipeline

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** Kafka BINARY wire protocol, built from the public protocol guide
  * (kafka.apache.org/protocol) the way `graft.grpc` builds gRPC from the
  * HTTP/2 spec: size-prefixed big-endian frames, request header v1, and the
  * non-flexible (pre-compact) versions of the five APIs a produce/consume
  * roundtrip needs — ApiVersions v0, Metadata v4 (with auto-topic-create),
  * Produce v3, Fetch v4 (read_committed capable), ListOffsets v2. Record
  * payloads travel as RecordBatch v2 ([[KafkaRecordBatch]] — varint records,
  * CRC32C over the post-crc section).
  *
  * Purpose: the env-gated live Kafka spec (LiveWireSpec) can exercise a REAL
  * broker with zero extra jars, upgrading the connector matrix's Kafka row
  * from "wire needs kafka-clients" to "wire client in-repo" — the same
  * standing KinesisWire gives the Kinesis row. In the zero-egress sandbox
  * the batch codec is pinned by KafkaWireSpec (self-roundtrip + CRC +
  * hand-computed frame layouts); the socket path runs only where
  * `KAFKA_BOOTSTRAP` points at a broker.
  *
  * Scope: plaintext listener, single required-acks produce, leader routing
  * via Metadata. Not implemented (loudly, not silently): SASL/TLS, flexible
  * (compact) encodings, consumer groups — the engine's own checkpointed
  * offsets replace group management, exactly like the reference's
  * StreamKafkaP manages offsets itself (StreamKafkaP.java:329).
  */
final class KafkaWire(bootstrap: String, clientId: String = "graft")
    extends AutoCloseable {

  import KafkaWire._

  private val (bootHost, bootPort) = {
    val Array(h, p) = bootstrap.split(":")
    (h, p.toInt)
  }
  private val sockets = scala.collection.mutable.HashMap.empty[(String, Int), Conn]
  private var correlation = 0

  private final class Conn(host: String, port: Int) {
    val socket = new Socket(host, port)
    socket.setSoTimeout(30000)
    val out = new DataOutputStream(socket.getOutputStream)
    val in = new DataInputStream(socket.getInputStream)
  }

  private def conn(host: String, port: Int): Conn =
    sockets.getOrElseUpdate((host, port), new Conn(host, port))

  override def close(): Unit = {
    sockets.values.foreach(c => c.socket.close())
    sockets.clear()
  }

  /** One request/response exchange: 4-byte size frame, request header v1
    * (api key, version, correlation id, nullable client id), correlated
    * response frame.
    */
  private def exchange(c: Conn, apiKey: Short, version: Short,
                       body: Array[Byte]): ByteBuffer = synchronized {
    correlation += 1
    val header = new ByteArrayOutputStream()
    val h = new DataOutputStream(header)
    h.writeShort(apiKey)
    h.writeShort(version)
    h.writeInt(correlation)
    val cid = clientId.getBytes(UTF_8)
    h.writeShort(cid.length)
    h.write(cid)
    val frame = header.toByteArray ++ body
    c.out.writeInt(frame.length)
    c.out.write(frame)
    c.out.flush()
    val size = c.in.readInt()
    val resp = new Array[Byte](size)
    c.in.readFully(resp)
    val buf = ByteBuffer.wrap(resp)
    val corr = buf.getInt
    require(corr == correlation, s"correlation mismatch: $corr != $correlation")
    buf
  }

  /** ApiVersions v0 → api key → (min, max) supported versions. */
  def apiVersions(): Map[Int, (Int, Int)] = {
    val buf = exchange(conn(bootHost, bootPort), 18, 0, Array.emptyByteArray)
    val err = buf.getShort
    require(err == 0, s"ApiVersions error $err")
    val n = buf.getInt
    (0 until n).map { _ =>
      val k = buf.getShort.toInt
      val min = buf.getShort.toInt
      val max = buf.getShort.toInt
      k -> (min, max)
    }.toMap
  }

  final case class PartitionMeta(partition: Int, leaderHost: String, leaderPort: Int)

  /** Metadata v4 for one topic, with allow_auto_topic_creation=true; returns
    * partition → leader address once a leader exists (bounded retry while
    * the broker elects one for a fresh topic).
    */
  def topicMetadata(topic: String, maxAttempts: Int = 40): Seq[PartitionMeta] = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val body = new ByteArrayOutputStream()
      val o = new DataOutputStream(body)
      o.writeInt(1) // topics array
      writeString(o, topic)
      o.writeBoolean(true) // allow_auto_topic_creation
      val buf = exchange(conn(bootHost, bootPort), 3, 4, body.toByteArray)
      buf.getInt // throttle
      val brokerCount = buf.getInt
      val brokers = (0 until brokerCount).map { _ =>
        val id = buf.getInt
        val host = readString(buf)
        val port = buf.getInt
        readNullableString(buf) // rack
        id -> (host, port)
      }.toMap
      readNullableString(buf) // cluster id
      buf.getInt // controller id
      val topicCount = buf.getInt
      var result = Vector.empty[PartitionMeta]
      var topicErr = 0
      (0 until topicCount).foreach { _ =>
        topicErr = buf.getShort.toInt
        readString(buf) // name
        buf.get // is_internal
        val pCount = buf.getInt
        (0 until pCount).foreach { _ =>
          val pErr = buf.getShort.toInt
          val partition = buf.getInt
          val leader = buf.getInt
          skipIntArray(buf) // replicas
          skipIntArray(buf) // isr
          if (pErr == 0 && leader >= 0)
            brokers.get(leader).foreach { case (h, p) =>
              result :+= PartitionMeta(partition, h, p)
            }
        }
      }
      if (topicErr == 0 && result.nonEmpty) return result.sortBy(_.partition)
      attempt += 1
      Thread.sleep(250) // LEADER_NOT_AVAILABLE / UNKNOWN_TOPIC while creating
    }
    throw new IllegalStateException(s"no leader for topic $topic after $maxAttempts attempts")
  }

  /** Produce v3 (acks=-1) one RecordBatch to a partition; returns the base
    * offset the broker assigned.
    */
  def produce(topic: String, partition: Int,
              records: Seq[(Array[Byte], Array[Byte])]): Long = {
    val pm = topicMetadata(topic).find(_.partition == partition)
      .getOrElse(throw new IllegalArgumentException(s"$topic has no partition $partition"))
    val batch = KafkaRecordBatch.encode(records, System.currentTimeMillis())
    val body = new ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    o.writeShort(-1) // transactional_id = null
    o.writeShort(-1) // acks = all
    o.writeInt(30000) // timeout
    o.writeInt(1) // one topic
    writeString(o, topic)
    o.writeInt(1) // one partition
    o.writeInt(partition)
    o.writeInt(batch.length) // record_set as BYTES
    o.write(batch)
    val buf = exchange(conn(pm.leaderHost, pm.leaderPort), 0, 3, body.toByteArray)
    val topicCount = buf.getInt
    require(topicCount == 1, s"produce: unexpected topic count $topicCount")
    readString(buf)
    val pCount = buf.getInt
    require(pCount == 1)
    buf.getInt // partition index
    val err = buf.getShort
    require(err == 0, s"produce error code $err")
    buf.getLong // base offset — keep reading in order
  }

  /** Fetch v4 from an offset (isolation_level 1 = read_committed); returns
    * (records, highWatermark) where records = (offset, key, value).
    */
  def fetch(topic: String, partition: Int, offset: Long,
            maxWaitMs: Int = 500): (Seq[(Long, Array[Byte], Array[Byte])], Long) = {
    val pm = topicMetadata(topic).find(_.partition == partition)
      .getOrElse(throw new IllegalArgumentException(s"$topic has no partition $partition"))
    val body = new ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    o.writeInt(-1) // replica_id
    o.writeInt(maxWaitMs)
    o.writeInt(1) // min_bytes
    o.writeInt(16 << 20) // max_bytes
    o.writeByte(1) // isolation_level = read_committed
    o.writeInt(1) // one topic
    writeString(o, topic)
    o.writeInt(1) // one partition
    o.writeInt(partition)
    o.writeLong(offset)
    o.writeInt(8 << 20) // partition_max_bytes
    val buf = exchange(conn(pm.leaderHost, pm.leaderPort), 1, 4, body.toByteArray)
    buf.getInt // throttle
    val topicCount = buf.getInt
    require(topicCount == 1, s"fetch: unexpected topic count $topicCount")
    readString(buf)
    val pCount = buf.getInt
    require(pCount == 1)
    buf.getInt // partition
    val err = buf.getShort
    require(err == 0, s"fetch error code $err")
    val highWatermark = buf.getLong
    buf.getLong // last_stable_offset
    val abortedCount = buf.getInt
    if (abortedCount > 0) (0 until abortedCount).foreach { _ =>
      buf.getLong; buf.getLong // producer_id, first_offset
    }
    val setLen = buf.getInt
    val recordSet = new Array[Byte](math.max(setLen, 0))
    if (setLen > 0) buf.get(recordSet)
    (KafkaRecordBatch.decodeAll(recordSet), highWatermark)
  }
}

object KafkaWire {
  private[pipeline] def writeString(o: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    o.writeShort(b.length)
    o.write(b)
  }
  private[pipeline] def readString(buf: ByteBuffer): String = {
    val len = buf.getShort
    val b = new Array[Byte](len)
    buf.get(b)
    new String(b, UTF_8)
  }
  private[pipeline] def readNullableString(buf: ByteBuffer): Option[String] = {
    val len = buf.getShort
    if (len < 0) None
    else {
      val b = new Array[Byte](len)
      buf.get(b)
      Some(new String(b, UTF_8))
    }
  }
  private def skipIntArray(buf: ByteBuffer): Unit = {
    val n = buf.getInt
    (0 until n).foreach(_ => buf.getInt)
  }
}

/** RecordBatch v2 (magic 2) — the on-wire record container since Kafka 0.11,
  * per the public format: fixed 61-byte batch header with a CRC32C over
  * everything after the crc field, then varint-encoded records (zigzag
  * lengths and deltas, nullable key/value, headers).
  */
object KafkaRecordBatch {

  val HeaderSize = 61

  def encode(records: Seq[(Array[Byte], Array[Byte])], baseTimestamp: Long,
             baseOffset: Long = 0L): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    val recs = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case ((key, value), i) =>
      val body = new ByteArrayOutputStream()
      body.write(0) // record attributes
      writeZigZag(body, 0L) // timestamp delta
      writeZigZag(body, i.toLong) // offset delta
      writeNullableBytes(body, key)
      writeNullableBytes(body, value)
      writeZigZag(body, 0L) // headers count
      val bytes = body.toByteArray
      writeZigZag(recs, bytes.length.toLong)
      recs.write(bytes)
    }
    val recordBytes = recs.toByteArray

    // section covered by the CRC: attributes .. records
    val crcSection = ByteBuffer.allocate(40 + recordBytes.length)
    crcSection.putShort(0) // attributes: no compression, no txn
    crcSection.putInt(records.size - 1) // last offset delta
    crcSection.putLong(baseTimestamp)
    crcSection.putLong(baseTimestamp) // max timestamp
    crcSection.putLong(-1L) // producer id
    crcSection.putShort(-1) // producer epoch
    crcSection.putInt(-1) // base sequence
    crcSection.putInt(records.size)
    crcSection.put(recordBytes)
    val section = crcSection.array()
    val crc = new CRC32C()
    crc.update(section)

    val batchLength = 4 + 1 + 4 + section.length // leaderEpoch+magic+crc+section
    val out = ByteBuffer.allocate(8 + 4 + batchLength)
    out.putLong(baseOffset)
    out.putInt(batchLength)
    out.putInt(-1) // partition leader epoch
    out.put(2.toByte) // magic
    out.putInt(crc.getValue.toInt)
    out.put(section)
    out.array()
  }

  /** Decode every batch in a fetched record set (a set may carry several
    * batches; a partial trailing batch — the broker may truncate at
    * max_bytes — is skipped). Returns (absoluteOffset, key, value).
    */
  def decodeAll(recordSet: Array[Byte]): Seq[(Long, Array[Byte], Array[Byte])] = {
    val out = Seq.newBuilder[(Long, Array[Byte], Array[Byte])]
    val buf = ByteBuffer.wrap(recordSet)
    while (buf.remaining() >= 12) {
      val baseOffset = buf.getLong
      val batchLength = buf.getInt
      if (buf.remaining() < batchLength) return out.result() // truncated tail
      val batch = new Array[Byte](batchLength)
      buf.get(batch)
      out ++= decodeBatch(baseOffset, batch)
    }
    out.result()
  }

  private def decodeBatch(baseOffset: Long,
                          batch: Array[Byte]): Seq[(Long, Array[Byte], Array[Byte])] = {
    val b = ByteBuffer.wrap(batch)
    b.getInt // partition leader epoch
    val magic = b.get()
    require(magic == 2, s"unsupported record batch magic $magic")
    val crcStored = b.getInt
    val section = new Array[Byte](b.remaining())
    b.get(section)
    val crc = new CRC32C()
    crc.update(section)
    require(crc.getValue.toInt == crcStored,
      f"record batch CRC mismatch: stored 0x$crcStored%08x computed 0x${crc.getValue.toInt}%08x")
    val s = ByteBuffer.wrap(section)
    val attributes = s.getShort
    require((attributes & 0x7) == 0,
      s"compressed batches not supported (codec ${attributes & 0x7})")
    val isControl = (attributes & 0x20) != 0
    s.getInt // last offset delta
    s.getLong // base timestamp
    s.getLong // max timestamp
    s.getLong // producer id
    s.getShort // producer epoch
    s.getInt // base sequence
    val count = s.getInt
    val out = Seq.newBuilder[(Long, Array[Byte], Array[Byte])]
    (0 until count).foreach { _ =>
      val len = readZigZag(s)
      val start = s.position()
      s.get // attributes
      readZigZag(s) // timestamp delta
      val offsetDelta = readZigZag(s)
      val key = readNullableBytes(s)
      val value = readNullableBytes(s)
      val headerCount = readZigZag(s)
      (0L until headerCount).foreach { _ =>
        val klen = readZigZag(s); s.position(s.position() + klen.toInt)
        val vlen = readZigZag(s); if (vlen >= 0) s.position(s.position() + vlen.toInt)
      }
      require(s.position() - start == len,
        s"record length mismatch: declared $len, read ${s.position() - start}")
      if (!isControl) out += ((baseOffset + offsetDelta, key, value))
    }
    out.result()
  }

  // ---------------------------------------------------- varint primitives

  private[pipeline] def writeZigZag(out: ByteArrayOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63)
    while ((z & ~0x7fL) != 0L) { out.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
    out.write(z.toInt)
  }

  private[pipeline] def readZigZag(buf: ByteBuffer): Long = {
    var v = 0L
    var shift = 0
    var cont = true
    while (cont) {
      val b = buf.get()
      v |= (b & 0x7fL) << shift
      shift += 7
      cont = (b & 0x80) != 0
    }
    (v >>> 1) ^ -(v & 1L)
  }

  private def writeNullableBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit =
    if (b == null) writeZigZag(out, -1L)
    else { writeZigZag(out, b.length.toLong); out.write(b) }

  private def readNullableBytes(buf: ByteBuffer): Array[Byte] = {
    val len = readZigZag(buf)
    if (len < 0) null
    else {
      val b = new Array[Byte](len.toInt)
      buf.get(b)
      b
    }
  }
}
