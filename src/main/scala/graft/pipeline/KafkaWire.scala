package graft.pipeline

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** Kafka BINARY wire protocol, built from the public protocol guide
  * (kafka.apache.org/protocol) the way `graft.grpc` builds gRPC from the
  * HTTP/2 spec: size-prefixed big-endian frames, and BOTH encoding families —
  * the non-flexible (pre-KIP-482) versions with request header v1
  * (ApiVersions v0, Metadata v4 with auto-topic-create, Produce v3, Fetch v4
  * read_committed capable, ListOffsets v2) and the flexible (compact)
  * versions with request header v2, compact strings/arrays (unsigned-varint
  * length+1) and tagged fields (ApiVersions v3, Metadata v9, Produce v9,
  * Fetch v12, ListOffsets v6). The client
  * NEGOTIATES per broker: ApiVersions v3 first (per KIP-511 a broker that
  * doesn't speak it answers v0-encoded with UNSUPPORTED_VERSION, which
  * triggers the v0 retry), then each API picks its flexible version when the
  * broker's advertised max allows and falls back to the non-flexible one
  * otherwise — so the client survives both a modern broker's version floor
  * and an old broker's ceiling. Record payloads travel as RecordBatch v2
  * ([[KafkaRecordBatch]] — varint records, CRC32C over the post-crc section).
  *
  * Purpose: the env-gated live Kafka spec (LiveWireSpec) can exercise a REAL
  * broker with zero extra jars, upgrading the connector matrix's Kafka row
  * from "wire needs kafka-clients" to "wire client in-repo" — the same
  * standing KinesisWire gives the Kinesis row. In the zero-egress sandbox
  * both encoding families are pinned by KafkaWireSpec (request bodies
  * byte-by-byte against the public guide's layouts, responses through the
  * same parsers the socket path uses); the socket path runs only where
  * `KAFKA_BOOTSTRAP` points at a broker.
  *
  * Scope: single required-acks produce, leader routing via Metadata.
  * Listeners: PLAINTEXT, SSL, SASL_PLAINTEXT, SASL_SSL — TLS rides JDK
  * SSLSocket and SASL PLAIN / SCRAM-SHA-256 run over SaslHandshake v1 +
  * SaslAuthenticate v0 framing per connection BEFORE any other API
  * ([[KafkaSecurity]], r14). Not implemented (loudly, not silently):
  * GSSAPI/OAUTHBEARER, record compression, consumer groups — the engine's
  * own checkpointed offsets replace group management, exactly like the
  * reference's StreamKafkaP manages offsets itself (StreamKafkaP.java:329).
  */
final class KafkaWire(bootstrap: String, clientId: String = "graft",
                      security: KafkaSecurity = KafkaSecurity.Plaintext)
    extends AutoCloseable {

  import KafkaWire._

  private val (bootHost, bootPort) = {
    val Array(h, p) = bootstrap.split(":")
    (h, p.toInt)
  }
  private val sockets = scala.collection.mutable.HashMap.empty[(String, Int), Conn]
  private var correlation = 0
  // per-broker negotiation (cache keyed by (host, port)): in a mixed-version
  // cluster (rolling upgrade) a partition leader may not support the flexible
  // version the bootstrap broker advertises, so every connection negotiates
  // its own version ranges before speaking any other API to it
  private val versionsCache =
    scala.collection.mutable.HashMap.empty[(String, Int), Map[Int, (Int, Int)]]

  private final class Conn(host: String, port: Int) {
    val socket = openSocket(host, port, security)
    socket.setSoTimeout(30000)
    val out = new DataOutputStream(socket.getOutputStream)
    val in = new DataInputStream(socket.getInputStream)
  }

  /** Every broker connection authenticates BEFORE carrying any other API —
    * matching broker enforcement on SASL listeners (any non-SASL request on
    * an unauthenticated connection is a protocol error there).
    */
  private def conn(host: String, port: Int): Conn =
    sockets.getOrElseUpdate((host, port), {
      val c = new Conn(host, port)
      // failed auth must not leak the socket: the connection never enters
      // the cache (so a retry re-dials), and the OS fd closes with it
      try security.saslMechanism.foreach(m => authenticate(c, m))
      catch { case e: Throwable => c.socket.close(); throw e }
      c
    })

  /** SaslHandshake v1 (names the mechanism; broker answers its supported
    * list) then SaslAuthenticate v0 rounds carrying the mechanism's tokens:
    * one round for PLAIN, two for SCRAM-SHA-256 (client-first/server-first,
    * client-final/server-final — the client VERIFIES the server signature,
    * so authentication is mutual).
    */
  private def authenticate(c: Conn, mechanism: String): Unit = {
    def authRound(token: Array[Byte]): Array[Byte] = {
      val buf = exchange(c, 36, 0, saslAuthenticateV0Request(token),
        flexible = false, flexibleResponseHeader = false)
      val (err, msg, resp) = parseSaslAuthenticateV0(buf)
      require(err == 0,
        s"SASL $mechanism authentication failed (error $err${msg.fold("")(": " + _)})")
      resp
    }
    val hs = exchange(c, 17, 1, saslHandshakeV1Request(mechanism),
      flexible = false, flexibleResponseHeader = false)
    val (hsErr, brokerMechs) = parseSaslHandshakeV1(hs)
    require(hsErr == 0,
      s"SaslHandshake($mechanism) error $hsErr — broker supports: ${brokerMechs.mkString(", ")}")
    mechanism match {
      case "PLAIN" =>
        authRound(KafkaSasl.plainAuthBytes(security.username, security.password))
        ()
      case "SCRAM-SHA-256" =>
        val scram = new KafkaSasl.ScramClient(
          security.username, security.password, KafkaSasl.freshNonce())
        val serverFirst = authRound(scram.clientFirstMessage.getBytes(UTF_8))
        val serverFinal =
          authRound(scram.clientFinalMessage(new String(serverFirst, UTF_8)).getBytes(UTF_8))
        scram.verifyServerFinal(new String(serverFinal, UTF_8))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported SASL mechanism '$other' — this client speaks PLAIN and SCRAM-SHA-256")
    }
  }

  override def close(): Unit = {
    sockets.values.foreach(c => c.socket.close())
    sockets.clear()
  }

  /** One request/response exchange. `flexible` selects request header v2
    * (tagged fields after client id) and response header v1 (tagged fields
    * after the correlation id) — EXCEPT ApiVersions, whose response header
    * is always v0 so version negotiation itself can't deadlock (KIP-511);
    * `flexibleResponseHeader=false` expresses that carve-out.
    */
  private def exchange(c: Conn, apiKey: Short, version: Short,
                       body: Array[Byte], flexible: Boolean,
                       flexibleResponseHeader: Boolean): ByteBuffer =
    synchronized {
      correlation += 1
      val frame =
        requestHeader(apiKey, version, correlation, clientId, flexible) ++ body
      c.out.writeInt(frame.length)
      c.out.write(frame)
      c.out.flush()
      val size = c.in.readInt()
      val resp = new Array[Byte](size)
      c.in.readFully(resp)
      val buf = ByteBuffer.wrap(resp)
      val corr = buf.getInt
      require(corr == correlation, s"correlation mismatch: $corr != $correlation")
      if (flexibleResponseHeader) skipTags(buf)
      buf
    }

  /** Negotiated api key → (min, max) supported versions, cached PER BROKER
    * connection. Tries ApiVersions v3 (flexible); a broker that can't parse
    * it answers with UNSUPPORTED_VERSION in a v0-encoded body (KIP-511),
    * which routes to a plain v0 request.
    */
  def apiVersions(host: String = bootHost, port: Int = bootPort): Map[Int, (Int, Int)] =
    versionsCache.getOrElseUpdate((host, port), {
      val c = conn(host, port)
      val buf = exchange(c, 18, 3, apiVersionsV3Request("graft", "0"),
        flexible = true, flexibleResponseHeader = false)
      val err = buf.getShort
      if (err == 35) { // UNSUPPORTED_VERSION → the broker predates v3
        val b0 = exchange(c, 18, 0, Array.emptyByteArray,
          flexible = false, flexibleResponseHeader = false)
        val e0 = b0.getShort
        require(e0 == 0, s"ApiVersions v0 error $e0")
        parseApiVersionsV0(b0)
      } else {
        require(err == 0, s"ApiVersions v3 error $err")
        parseApiVersionsV3(buf)
      }
    })

  private def maxVersion(apiKey: Int, host: String = bootHost,
                         port: Int = bootPort): Int =
    apiVersions(host, port).get(apiKey).map(_._2).getOrElse(-1)

  final case class PartitionMeta(partition: Int, leaderHost: String, leaderPort: Int)

  /** Metadata for one topic with allow_auto_topic_creation=true — v9
    * (flexible) when the broker supports it, else v4; returns partition →
    * leader address once a leader exists (bounded retry while the broker
    * elects one for a fresh topic).
    */
  def topicMetadata(topic: String, maxAttempts: Int = 40): Seq[PartitionMeta] = {
    val v9 = maxVersion(3) >= 9
    var attempt = 0
    while (attempt < maxAttempts) {
      val buf =
        if (v9) exchange(conn(bootHost, bootPort), 3, 9,
          metadataV9Request(topic), flexible = true, flexibleResponseHeader = true)
        else exchange(conn(bootHost, bootPort), 3, 4,
          metadataV4Request(topic), flexible = false, flexibleResponseHeader = false)
      val (topicErr, result) =
        if (v9) parseMetadataV9(buf) else parseMetadataV4(buf)
      if (topicErr == 0 && result.nonEmpty)
        return result.map(r => PartitionMeta(r._1, r._2, r._3)).sortBy(_.partition)
      attempt += 1
      Thread.sleep(250) // LEADER_NOT_AVAILABLE / UNKNOWN_TOPIC while creating
    }
    throw new IllegalStateException(s"no leader for topic $topic after $maxAttempts attempts")
  }

  /** Produce one RecordBatch to a partition with acks=-1 — v9 (flexible)
    * when supported, else v3; returns the base offset the broker assigned.
    */
  def produce(topic: String, partition: Int,
              records: Seq[(Array[Byte], Array[Byte])]): Long = {
    val pm = topicMetadata(topic).find(_.partition == partition)
      .getOrElse(throw new IllegalArgumentException(s"$topic has no partition $partition"))
    val batch = KafkaRecordBatch.encode(records, System.currentTimeMillis())
    val v9 = maxVersion(0, pm.leaderHost, pm.leaderPort) >= 9
    val buf =
      if (v9) exchange(conn(pm.leaderHost, pm.leaderPort), 0, 9,
        produceV9Request(topic, partition, batch),
        flexible = true, flexibleResponseHeader = true)
      else exchange(conn(pm.leaderHost, pm.leaderPort), 0, 3,
        produceV3Request(topic, partition, batch),
        flexible = false, flexibleResponseHeader = false)
    val (err, baseOffset) =
      if (v9) parseProduceV9(buf) else parseProduceV3(buf)
    require(err == 0, s"produce error code $err")
    baseOffset
  }

  /** Fetch from an offset (isolation_level 1 = read_committed) — v12
    * (flexible, sessionless: session_id=0/epoch=-1) when supported, else
    * v4; returns (records, highWatermark) where records = (offset, key,
    * value).
    */
  def fetch(topic: String, partition: Int, offset: Long,
            maxWaitMs: Int = 500): (Seq[(Long, Array[Byte], Array[Byte])], Long) = {
    val pm = topicMetadata(topic).find(_.partition == partition)
      .getOrElse(throw new IllegalArgumentException(s"$topic has no partition $partition"))
    val v12 = maxVersion(1, pm.leaderHost, pm.leaderPort) >= 12
    val buf =
      if (v12) exchange(conn(pm.leaderHost, pm.leaderPort), 1, 12,
        fetchV12Request(topic, partition, offset, maxWaitMs),
        flexible = true, flexibleResponseHeader = true)
      else exchange(conn(pm.leaderHost, pm.leaderPort), 1, 4,
        fetchV4Request(topic, partition, offset, maxWaitMs),
        flexible = false, flexibleResponseHeader = false)
    val (err, highWatermark, recordSet) =
      if (v12) parseFetchV12(buf) else parseFetchV4(buf)
    require(err == 0, s"fetch error code $err")
    (KafkaRecordBatch.decodeAll(recordSet), highWatermark)
  }

  /** ListOffsets for one partition — v6 (flexible) when supported, else v2;
    * `timestamp` -1 = latest (the log-end offset a new consumer seeks to),
    * -2 = earliest (the log-start offset after retention), or a real epoch
    * millisecond for time-indexed lookup. read_committed isolation, matching
    * fetch.
    */
  def listOffset(topic: String, partition: Int, timestamp: Long = -1L): Long = {
    val pm = topicMetadata(topic).find(_.partition == partition)
      .getOrElse(throw new IllegalArgumentException(s"$topic has no partition $partition"))
    val v6 = maxVersion(2, pm.leaderHost, pm.leaderPort) >= 6
    val buf =
      if (v6) exchange(conn(pm.leaderHost, pm.leaderPort), 2, 6,
        listOffsetsV6Request(topic, partition, timestamp),
        flexible = true, flexibleResponseHeader = true)
      else exchange(conn(pm.leaderHost, pm.leaderPort), 2, 2,
        listOffsetsV2Request(topic, partition, timestamp),
        flexible = false, flexibleResponseHeader = false)
    val (err, offset) =
      if (v6) parseListOffsetsV6(buf) else parseListOffsetsV2(buf)
    require(err == 0, s"listOffsets error code $err")
    offset
  }
}

/** Pure request builders and response parsers for both encoding families —
  * package-private so KafkaWireSpec pins every byte without a broker, and
  * the socket path above goes through EXACTLY these functions.
  */
object KafkaWire {

  // ------------------------------------------------------------- transport
  /** Plain or TLS socket per [[KafkaSecurity]]. The secure TLS path is full
    * JDK PKIX with endpoint identification (hostname verification);
    * `tlsInsecure` (self-signed test listeners) trusts any chain and skips
    * the hostname check — never the default.
    */
  private[pipeline] def openSocket(host: String, port: Int,
                                   security: KafkaSecurity): Socket =
    if (!security.tls) new Socket(host, port)
    else {
      import javax.net.ssl.{SSLContext, SSLSocket, X509TrustManager}
      val ctx =
        if (!security.tlsInsecure) SSLContext.getDefault
        else {
          val c = SSLContext.getInstance("TLS")
          c.init(null, Array[javax.net.ssl.TrustManager](new X509TrustManager {
            def checkClientTrusted(chain: Array[java.security.cert.X509Certificate], authType: String): Unit = ()
            def checkServerTrusted(chain: Array[java.security.cert.X509Certificate], authType: String): Unit = ()
            def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
          }), null)
          c
        }
      val s = ctx.getSocketFactory.createSocket(host, port).asInstanceOf[SSLSocket]
      if (!security.tlsInsecure) {
        val p = s.getSSLParameters
        p.setEndpointIdentificationAlgorithm("HTTPS")
        s.setSSLParameters(p)
      }
      s.startHandshake()
      s
    }

  // ------------------------------------------------------------------ SASL
  /** SaslHandshake v1 body: just the mechanism (legacy string). */
  private[pipeline] def saslHandshakeV1Request(mechanism: String): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    writeString(o, mechanism)
    body.toByteArray
  }
  /** → (errorCode, broker's enabled mechanisms). */
  private[pipeline] def parseSaslHandshakeV1(buf: ByteBuffer): (Int, Seq[String]) = {
    val err = buf.getShort.toInt
    val n = buf.getInt
    (err, (0 until n).map(_ => readString(buf)))
  }
  /** SaslAuthenticate v0 body: auth_bytes (BYTES: int32 length prefix). */
  private[pipeline] def saslAuthenticateV0Request(authBytes: Array[Byte]): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    o.writeInt(authBytes.length)
    o.write(authBytes)
    body.toByteArray
  }
  /** → (errorCode, errorMessage, auth_bytes — the mechanism's server token). */
  private[pipeline] def parseSaslAuthenticateV0(
      buf: ByteBuffer): (Int, Option[String], Array[Byte]) = {
    val err = buf.getShort.toInt
    val msg = readNullableString(buf)
    val len = buf.getInt
    val b = new Array[Byte](math.max(len, 0))
    if (len > 0) buf.get(b)
    (err, msg, b)
  }

  // ---------------------------------------------------------------- legacy
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

  // ------------------------------------------------- compact (KIP-482) core
  /** Unsigned varint (NOT zigzag — that's the record-level encoding). */
  private[pipeline] def writeUVarint(o: ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) {
      o.write((v & 0x7f) | 0x80)
      v >>>= 7
    }
    o.write(v)
  }
  private[pipeline] def readUVarint(buf: ByteBuffer): Int = {
    var value = 0
    var shift = 0
    var b = 0
    do {
      // bound the continuation bytes: a 6th byte would shift past 31 bits
      // and silently wrap (<< is mod-32 on Int), corrupting the length and
      // misparsing the rest of the frame — fail loudly instead, matching
      // this client's convention
      require(shift < 35, "malformed unsigned varint: more than 5 bytes")
      b = buf.get & 0xff
      value |= (b & 0x7f) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    value
  }
  /** COMPACT_STRING: unsigned varint of length+1, then bytes. */
  private[pipeline] def writeCompactString(o: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeUVarint(o, b.length + 1)
    o.write(b, 0, b.length)
  }
  /** COMPACT_NULLABLE_STRING: 0 encodes null. */
  private[pipeline] def writeCompactNullableString(
      o: ByteArrayOutputStream, s: String): Unit =
    if (s == null) writeUVarint(o, 0) else writeCompactString(o, s)
  private[pipeline] def readCompactString(buf: ByteBuffer): String = {
    val n = readUVarint(buf)
    require(n > 0, "null in non-nullable compact string")
    val b = new Array[Byte](n - 1)
    buf.get(b)
    new String(b, UTF_8)
  }
  private[pipeline] def readCompactNullableString(buf: ByteBuffer): Option[String] = {
    val n = readUVarint(buf)
    if (n == 0) None
    else {
      val b = new Array[Byte](n - 1)
      buf.get(b)
      Some(new String(b, UTF_8))
    }
  }
  /** COMPACT_NULLABLE_BYTES / COMPACT_RECORDS: varint of length+1, 0 = null. */
  private[pipeline] def writeCompactBytes(
      o: ByteArrayOutputStream, b: Array[Byte]): Unit =
    if (b == null) writeUVarint(o, 0)
    else {
      writeUVarint(o, b.length + 1)
      o.write(b, 0, b.length)
    }
  private[pipeline] def readCompactBytes(buf: ByteBuffer): Array[Byte] = {
    val n = readUVarint(buf)
    if (n == 0) null
    else {
      val b = new Array[Byte](n - 1)
      buf.get(b)
      b
    }
  }
  /** COMPACT_ARRAY length: varint of count+1 (−1 = null → 0). */
  private[pipeline] def writeCompactArrayLen(o: ByteArrayOutputStream, n: Int): Unit =
    writeUVarint(o, n + 1)
  private[pipeline] def readCompactArrayLen(buf: ByteBuffer): Int =
    readUVarint(buf) - 1
  /** Tagged-field section: this client sends none and skips any received. */
  private[pipeline] def writeEmptyTags(o: ByteArrayOutputStream): Unit =
    writeUVarint(o, 0)
  private[pipeline] def skipTags(buf: ByteBuffer): Unit = {
    val n = readUVarint(buf)
    (0 until n).foreach { _ =>
      readUVarint(buf) // tag
      val size = readUVarint(buf)
      buf.position(buf.position() + size)
    }
  }

  // ------------------------------------------------------- request headers
  /** Header v1 (non-flexible APIs) or v2 (flexible: + tagged fields). The
    * client id stays a LEGACY nullable string in both — header v2 changed
    * only the trailer (KIP-482).
    */
  private[pipeline] def requestHeader(apiKey: Short, version: Short,
                                      correlation: Int, clientId: String,
                                      flexible: Boolean): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val h = new DataOutputStream(o)
    h.writeShort(apiKey)
    h.writeShort(version)
    h.writeInt(correlation)
    val cid = clientId.getBytes(UTF_8)
    h.writeShort(cid.length)
    h.write(cid)
    if (flexible) writeEmptyTags(o)
    o.toByteArray
  }

  // ------------------------------------------------------------ ApiVersions
  /** v3 body: client_software_name + client_software_version (compact) + tags. */
  private[pipeline] def apiVersionsV3Request(name: String, ver: String): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    writeCompactString(o, name)
    writeCompactString(o, ver)
    writeEmptyTags(o)
    o.toByteArray
  }
  private[pipeline] def parseApiVersionsV0(buf: ByteBuffer): Map[Int, (Int, Int)] = {
    val n = buf.getInt
    (0 until n).map { _ =>
      val k = buf.getShort.toInt
      val min = buf.getShort.toInt
      val max = buf.getShort.toInt
      k -> (min, max)
    }.toMap
  }
  /** v3 body AFTER the error short: compact api_keys [key,min,max,TAGS],
    * throttle, tags.
    */
  private[pipeline] def parseApiVersionsV3(buf: ByteBuffer): Map[Int, (Int, Int)] = {
    val n = readCompactArrayLen(buf)
    val m = (0 until n).map { _ =>
      val k = buf.getShort.toInt
      val min = buf.getShort.toInt
      val max = buf.getShort.toInt
      skipTags(buf)
      k -> (min, max)
    }.toMap
    buf.getInt // throttle
    skipTags(buf)
    m
  }

  // --------------------------------------------------------------- Metadata
  private[pipeline] def metadataV4Request(topic: String): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    o.writeInt(1) // topics array
    writeString(o, topic)
    o.writeBoolean(true) // allow_auto_topic_creation
    body.toByteArray
  }
  /** v9 body: compact topics [compact name, TAGS], allow_auto_topic_creation,
    * include_cluster_authorized_operations, include_topic_authorized_operations,
    * TAGS.
    */
  private[pipeline] def metadataV9Request(topic: String): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    writeCompactArrayLen(o, 1)
    writeCompactString(o, topic)
    writeEmptyTags(o) // per-topic
    o.write(1) // allow_auto_topic_creation
    o.write(0) // include_cluster_authorized_operations
    o.write(0) // include_topic_authorized_operations
    writeEmptyTags(o)
    o.toByteArray
  }
  /** → (topicErrorCode, Seq((partition, leaderHost, leaderPort))). */
  private[pipeline] def parseMetadataV4(buf: ByteBuffer): (Int, Seq[(Int, String, Int)]) = {
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
    var result = Vector.empty[(Int, String, Int)]
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
          brokers.get(leader).foreach { case (h, p) => result :+= ((partition, h, p)) }
      }
    }
    (topicErr, result)
  }
  /** v9: throttle, compact brokers [id, compact host, port, compact nullable
    * rack, TAGS], compact nullable cluster_id, controller_id, compact topics
    * [err, compact name, is_internal, compact partitions [err, idx, leader,
    * leader_epoch, replicas, isr, offline (compact int arrays), TAGS],
    * topic_authorized_operations, TAGS], cluster_authorized_operations, TAGS.
    */
  private[pipeline] def parseMetadataV9(buf: ByteBuffer): (Int, Seq[(Int, String, Int)]) = {
    def skipCompactIntArray(): Unit = {
      val n = readCompactArrayLen(buf)
      (0 until n).foreach(_ => buf.getInt)
    }
    buf.getInt // throttle
    val brokerCount = readCompactArrayLen(buf)
    val brokers = (0 until brokerCount).map { _ =>
      val id = buf.getInt
      val host = readCompactString(buf)
      val port = buf.getInt
      readCompactNullableString(buf) // rack
      skipTags(buf)
      id -> (host, port)
    }.toMap
    readCompactNullableString(buf) // cluster id
    buf.getInt // controller id
    val topicCount = readCompactArrayLen(buf)
    var result = Vector.empty[(Int, String, Int)]
    var topicErr = 0
    (0 until topicCount).foreach { _ =>
      topicErr = buf.getShort.toInt
      readCompactString(buf) // name
      buf.get // is_internal
      val pCount = readCompactArrayLen(buf)
      (0 until pCount).foreach { _ =>
        val pErr = buf.getShort.toInt
        val partition = buf.getInt
        val leader = buf.getInt
        buf.getInt // leader_epoch
        skipCompactIntArray() // replicas
        skipCompactIntArray() // isr
        skipCompactIntArray() // offline_replicas
        skipTags(buf)
        if (pErr == 0 && leader >= 0)
          brokers.get(leader).foreach { case (h, p) => result :+= ((partition, h, p)) }
      }
      buf.getInt // topic_authorized_operations
      skipTags(buf)
    }
    buf.getInt // cluster_authorized_operations
    skipTags(buf)
    (topicErr, result)
  }

  // ---------------------------------------------------------------- Produce
  private[pipeline] def produceV3Request(topic: String, partition: Int,
                                         batch: Array[Byte]): Array[Byte] = {
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
    body.toByteArray
  }
  /** v9 body: compact nullable transactional_id, acks, timeout, compact
    * topics [compact name, compact partitions [index, compact records,
    * TAGS], TAGS], TAGS.
    */
  private[pipeline] def produceV9Request(topic: String, partition: Int,
                                         batch: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    writeCompactNullableString(o, null) // transactional_id
    val d = new DataOutputStream(o)
    d.writeShort(-1) // acks = all
    d.writeInt(30000) // timeout
    writeCompactArrayLen(o, 1)
    writeCompactString(o, topic)
    writeCompactArrayLen(o, 1)
    d.writeInt(partition)
    writeCompactBytes(o, batch)
    writeEmptyTags(o) // per-partition
    writeEmptyTags(o) // per-topic
    writeEmptyTags(o)
    o.toByteArray
  }
  /** → (errorCode, baseOffset). */
  private[pipeline] def parseProduceV3(buf: ByteBuffer): (Int, Long) = {
    val topicCount = buf.getInt
    require(topicCount == 1, s"produce: unexpected topic count $topicCount")
    readString(buf)
    val pCount = buf.getInt
    require(pCount == 1)
    buf.getInt // partition index
    val err = buf.getShort.toInt
    val baseOffset = buf.getLong
    (err, baseOffset)
  }
  /** v9: compact responses [compact name, compact partitions [index, err,
    * base_offset, log_append_time, log_start_offset, compact record_errors
    * [batch_index, compact nullable message, TAGS], compact nullable
    * error_message, TAGS], TAGS], throttle, TAGS.
    */
  private[pipeline] def parseProduceV9(buf: ByteBuffer): (Int, Long) = {
    val topicCount = readCompactArrayLen(buf)
    require(topicCount == 1, s"produce: unexpected topic count $topicCount")
    readCompactString(buf)
    val pCount = readCompactArrayLen(buf)
    require(pCount == 1)
    buf.getInt // partition index
    val err = buf.getShort.toInt
    val baseOffset = buf.getLong
    buf.getLong // log_append_time
    buf.getLong // log_start_offset
    val recErrs = readCompactArrayLen(buf)
    (0 until recErrs).foreach { _ =>
      buf.getInt // batch_index
      readCompactNullableString(buf)
      skipTags(buf)
    }
    readCompactNullableString(buf) // error_message
    skipTags(buf) // per-partition
    skipTags(buf) // per-topic
    buf.getInt // throttle
    skipTags(buf)
    (err, baseOffset)
  }

  // ------------------------------------------------------------ ListOffsets
  private[pipeline] def listOffsetsV2Request(topic: String, partition: Int,
                                             timestamp: Long): Array[Byte] = {
    val body = new ByteArrayOutputStream()
    val o = new DataOutputStream(body)
    o.writeInt(-1) // replica_id
    o.writeByte(1) // isolation_level = read_committed
    o.writeInt(1) // one topic
    writeString(o, topic)
    o.writeInt(1) // one partition
    o.writeInt(partition)
    o.writeLong(timestamp)
    body.toByteArray
  }
  /** v6 body: replica_id, isolation_level, compact topics [compact name,
    * compact partitions [partition, current_leader_epoch, timestamp, TAGS],
    * TAGS], TAGS.
    */
  private[pipeline] def listOffsetsV6Request(topic: String, partition: Int,
                                             timestamp: Long): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val d = new DataOutputStream(o)
    d.writeInt(-1) // replica_id
    d.writeByte(1) // isolation_level = read_committed
    writeCompactArrayLen(o, 1)
    writeCompactString(o, topic)
    writeCompactArrayLen(o, 1)
    d.writeInt(partition)
    d.writeInt(-1) // current_leader_epoch
    d.writeLong(timestamp)
    writeEmptyTags(o) // per-partition
    writeEmptyTags(o) // per-topic
    writeEmptyTags(o)
    o.toByteArray
  }
  /** → (errorCode, offset). */
  private[pipeline] def parseListOffsetsV2(buf: ByteBuffer): (Int, Long) = {
    buf.getInt // throttle
    val topicCount = buf.getInt
    require(topicCount == 1, s"listOffsets: unexpected topic count $topicCount")
    readString(buf)
    val pCount = buf.getInt
    require(pCount == 1)
    buf.getInt // partition
    val err = buf.getShort.toInt
    buf.getLong // timestamp
    val offset = buf.getLong
    (err, offset)
  }
  /** v6: throttle, compact topics [compact name, compact partitions
    * [partition, err, timestamp, offset, leader_epoch, TAGS], TAGS], TAGS.
    */
  private[pipeline] def parseListOffsetsV6(buf: ByteBuffer): (Int, Long) = {
    buf.getInt // throttle
    val topicCount = readCompactArrayLen(buf)
    require(topicCount == 1, s"listOffsets: unexpected topic count $topicCount")
    readCompactString(buf)
    val pCount = readCompactArrayLen(buf)
    require(pCount == 1)
    buf.getInt // partition
    val err = buf.getShort.toInt
    buf.getLong // timestamp
    val offset = buf.getLong
    buf.getInt // leader_epoch
    skipTags(buf) // per-partition
    skipTags(buf) // per-topic
    skipTags(buf)
    (err, offset)
  }

  // ------------------------------------------------------------------ Fetch
  private[pipeline] def fetchV4Request(topic: String, partition: Int,
                                       offset: Long, maxWaitMs: Int): Array[Byte] = {
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
    body.toByteArray
  }
  /** v12 body (sessionless: session_id=0, epoch=-1 disables incremental
    * fetch sessions): replica_id, max_wait, min_bytes, max_bytes, isolation,
    * session_id, session_epoch, compact topics [compact name, compact
    * partitions [partition, current_leader_epoch, fetch_offset,
    * last_fetched_epoch, log_start_offset, partition_max_bytes, TAGS],
    * TAGS], compact forgotten [], compact rack_id, TAGS.
    */
  private[pipeline] def fetchV12Request(topic: String, partition: Int,
                                        offset: Long, maxWaitMs: Int): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    val d = new DataOutputStream(o)
    d.writeInt(-1) // replica_id
    d.writeInt(maxWaitMs)
    d.writeInt(1) // min_bytes
    d.writeInt(16 << 20) // max_bytes
    d.writeByte(1) // isolation_level = read_committed
    d.writeInt(0) // session_id
    d.writeInt(-1) // session_epoch
    writeCompactArrayLen(o, 1)
    writeCompactString(o, topic)
    writeCompactArrayLen(o, 1)
    d.writeInt(partition)
    d.writeInt(-1) // current_leader_epoch
    d.writeLong(offset)
    d.writeInt(-1) // last_fetched_epoch
    d.writeLong(-1L) // log_start_offset
    d.writeInt(8 << 20) // partition_max_bytes
    writeEmptyTags(o) // per-partition
    writeEmptyTags(o) // per-topic
    writeCompactArrayLen(o, 0) // forgotten_topics_data
    writeCompactString(o, "") // rack_id
    writeEmptyTags(o)
    o.toByteArray
  }
  /** → (errorCode, highWatermark, recordSet). */
  private[pipeline] def parseFetchV4(buf: ByteBuffer): (Int, Long, Array[Byte]) = {
    buf.getInt // throttle
    val topicCount = buf.getInt
    require(topicCount == 1, s"fetch: unexpected topic count $topicCount")
    readString(buf)
    val pCount = buf.getInt
    require(pCount == 1)
    buf.getInt // partition
    val err = buf.getShort.toInt
    val highWatermark = buf.getLong
    buf.getLong // last_stable_offset
    val abortedCount = buf.getInt
    if (abortedCount > 0) (0 until abortedCount).foreach { _ =>
      buf.getLong; buf.getLong // producer_id, first_offset
    }
    val setLen = buf.getInt
    val recordSet = new Array[Byte](math.max(setLen, 0))
    if (setLen > 0) buf.get(recordSet)
    (err, highWatermark, recordSet)
  }
  /** v12: throttle, err, session_id, compact responses [compact topic,
    * compact partitions [idx, err, high_watermark, last_stable_offset,
    * log_start_offset, compact nullable aborted [producer_id, first_offset,
    * TAGS], preferred_read_replica, compact records, TAGS], TAGS], TAGS.
    */
  private[pipeline] def parseFetchV12(buf: ByteBuffer): (Int, Long, Array[Byte]) = {
    buf.getInt // throttle
    val topErr = buf.getShort.toInt
    require(topErr == 0, s"fetch: top-level error $topErr")
    buf.getInt // session_id
    val topicCount = readCompactArrayLen(buf)
    require(topicCount == 1, s"fetch: unexpected topic count $topicCount")
    readCompactString(buf)
    val pCount = readCompactArrayLen(buf)
    require(pCount == 1)
    buf.getInt // partition
    val err = buf.getShort.toInt
    val highWatermark = buf.getLong
    buf.getLong // last_stable_offset
    buf.getLong // log_start_offset
    val abortedCount = readCompactArrayLen(buf)
    if (abortedCount > 0) (0 until abortedCount).foreach { _ =>
      buf.getLong; buf.getLong // producer_id, first_offset
      skipTags(buf)
    }
    buf.getInt // preferred_read_replica
    val recordSet = readCompactBytes(buf)
    skipTags(buf) // per-partition
    skipTags(buf) // per-topic
    skipTags(buf)
    (err, highWatermark, if (recordSet == null) Array.emptyByteArray else recordSet)
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
