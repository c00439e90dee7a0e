package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 (the PUBLIC signing spec from the AWS General
  * Reference: canonical request → string-to-sign → HMAC key derivation
  * chain). Implemented from the published algorithm so the Kinesis wire
  * client below can authenticate against a real endpoint (or localstack)
  * without any AWS SDK on the classpath — the zero-egress sandbox verifies
  * the signer against AWS's own documented test vector (SigV4Spec), and the
  * env-gated live spec exercises the wire where an endpoint exists.
  */
object SigV4 {

  final case class Credentials(accessKey: String, secretKey: String,
                               sessionToken: Option[String] = None)

  private val amzDateFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'")

  def hexSha256(data: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(data)
      .map("%02x".format(_)).mkString

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** The derived signing key: kDate → kRegion → kService → kSigning. */
  def signingKey(secret: String, date: String, region: String,
                 service: String): Array[Byte] = {
    val kDate = hmac(s"AWS4$secret".getBytes(UTF_8), date)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    hmac(kService, "aws4_request")
  }

  /** Canonical request per the spec: headers must be lowercase, trimmed,
    * sorted; the query string already canonical (callers here use none or
    * pre-sorted).
    */
  def canonicalRequest(method: String, uri: String, query: String,
                       headers: Seq[(String, String)], payloadHash: String): String = {
    val canon = headers
      .map { case (k, v) => (k.toLowerCase, v.trim.replaceAll("\\s+", " ")) }
      .sortBy(_._1)
    val headerBlock = canon.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = canon.map(_._1).mkString(";")
    s"$method\n$uri\n$query\n$headerBlock\n$signedHeaders\n$payloadHash"
  }

  def stringToSign(amzDate: String, scope: String, canonicalReq: String): String =
    s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n" +
      hexSha256(canonicalReq.getBytes(UTF_8))

  def signature(secret: String, date: String, region: String, service: String,
                toSign: String): String =
    hmac(signingKey(secret, date, region, service), toSign)
      .map("%02x".format(_)).mkString

  /** Full Authorization header for a request (headers must include host and
    * x-amz-date; date args derived from `now` when omitted).
    */
  def authorization(creds: Credentials, region: String, service: String,
                    method: String, uri: String, query: String,
                    headers: Seq[(String, String)], payload: Array[Byte],
                    amzDate: String): String = {
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val canonical = canonicalRequest(method, uri, query, headers, hexSha256(payload))
    val sig = signature(creds.secretKey, date, region, service,
      stringToSign(amzDate, scope, canonical))
    val signedHeaders = headers.map(_._1.toLowerCase).sorted.mkString(";")
    s"AWS4-HMAC-SHA256 Credential=${creds.accessKey}/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$sig"
  }

  def nowAmzDate(): String =
    ZonedDateTime.now(ZoneOffset.UTC).format(amzDateFmt)
}

/** Minimal Kinesis Data Streams client over the PUBLIC JSON wire protocol
  * (POST / with `X-Amz-Target: Kinesis_20131202.<Action>` +
  * `application/x-amz-json-1.1`, SigV4-signed) — the same operations the
  * reference's Kinesis connector issues through the AWS SDK
  * (extensions/kinesis/.../KinesisSources.java): CreateStream, PutRecord,
  * ListShards, GetShardIterator, GetRecords. Exists for the env-gated live
  * integration spec (LiveWireSpec): in environments with a reachable
  * endpoint (real AWS or localstack) it runs the SAME data assertions the
  * stub-backed KinesisShapedSourceSpec pins in-sandbox.
  */
final class KinesisWire(endpoint: String, region: String,
                        creds: SigV4.Credentials) {

  private val mapper = new ObjectMapper()

  /** Request bodies are built with Jackson, never string interpolation —
    * stream names and partition keys are caller data, and a quote or
    * backslash in either must serialize as valid JSON, not break the body.
    */
  private def json(fields: (String, Any)*): String = {
    val node = mapper.createObjectNode()
    fields.foreach {
      case (k, v: String) => node.put(k, v)
      case (k, v: Int)    => node.put(k, v)
      case (k, v: Long)   => node.put(k, v)
      case (k, v)         => node.put(k, String.valueOf(v))
    }
    mapper.writeValueAsString(node)
  }

  def createStream(name: String, shards: Int): Unit = {
    call("CreateStream", json("StreamName" -> name, "ShardCount" -> shards))
    ()
  }

  def streamStatus(name: String): String =
    mapper.readTree(call("DescribeStreamSummary", json("StreamName" -> name)))
      .path("StreamDescriptionSummary").path("StreamStatus").asText()

  def putRecord(stream: String, partitionKey: String, data: String): String = {
    val b64 = java.util.Base64.getEncoder.encodeToString(data.getBytes(UTF_8))
    val resp = call("PutRecord",
      json("StreamName" -> stream, "PartitionKey" -> partitionKey, "Data" -> b64))
    mapper.readTree(resp).path("SequenceNumber").asText()
  }

  def listShards(stream: String): Seq[String] = {
    val resp = mapper.readTree(call("ListShards", json("StreamName" -> stream)))
    val it = resp.path("Shards").elements()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next().path("ShardId").asText()
    b.result()
  }

  def shardIterator(stream: String, shardId: String): String =
    mapper.readTree(call("GetShardIterator",
      json("StreamName" -> stream, "ShardId" -> shardId,
        "ShardIteratorType" -> "TRIM_HORIZON")))
      .path("ShardIterator").asText()

  /** Drains one shard from TRIM_HORIZON; returns decoded record payloads. */
  def readShard(stream: String, shardId: String, maxCalls: Int = 20): Seq[String] = {
    var it = shardIterator(stream, shardId)
    val out = Seq.newBuilder[String]
    var calls = 0
    var drained = false
    while (!drained && calls < maxCalls && it != null && it.nonEmpty) {
      val resp = mapper.readTree(
        call("GetRecords", json("ShardIterator" -> it, "Limit" -> 1000)))
      val recs = resp.path("Records")
      val e = recs.elements()
      var n = 0
      while (e.hasNext) {
        out += new String(
          java.util.Base64.getDecoder.decode(e.next().path("Data").asText()), UTF_8)
        n += 1
      }
      drained = n == 0 && resp.path("MillisBehindLatest").asLong(0L) == 0L
      it = Option(resp.path("NextShardIterator").asText(null)).orNull
      calls += 1
    }
    out.result()
  }

  private def call(action: String, body: String): String = {
    val payload = body.getBytes(UTF_8)
    val uri = URI.create(endpoint)
    val host =
      if (uri.getPort > 0) s"${uri.getHost}:${uri.getPort}" else uri.getHost
    val amzDate = SigV4.nowAmzDate()
    val baseHeaders = Seq(
      "content-type" -> "application/x-amz-json-1.1",
      "host" -> host,
      "x-amz-date" -> amzDate,
      "x-amz-target" -> s"Kinesis_20131202.$action") ++
      creds.sessionToken.map("x-amz-security-token" -> _)
    val auth = SigV4.authorization(creds, region, "kinesis",
      "POST", "/", "", baseHeaders, payload, amzDate)

    val conn = URI.create(s"$endpoint/").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    baseHeaders.filterNot(_._1 == "host")
      .foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setRequestProperty("Authorization", auth)
    conn.getOutputStream.write(payload)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val resp = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.emptyByteArray), UTF_8)
    require(code < 400, s"Kinesis $action failed HTTP $code: ${resp.take(400)}")
    resp
  }
}
