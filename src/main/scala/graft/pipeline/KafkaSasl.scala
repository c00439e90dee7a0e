package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** Security configuration for [[KafkaWire]] — the in-repo analog of the
  * `security.protocol` / `sasl.*` properties the reference passes through to
  * kafka-clients (extensions/kafka/.../KafkaSources.java:51 properties map).
  *
  *   - `tls` wraps every broker socket in JDK SSLSocket (TLS rides
  *     SSLEngine; no extra jars). `tlsInsecure` trusts any certificate and
  *     skips hostname verification — for self-signed test listeners ONLY,
  *     and says so loudly in the scaladoc rather than being a hidden
  *     default: the secure path does full JDK PKIX + endpoint
  *     identification.
  *   - `saslMechanism` = PLAIN (RFC 4616) or SCRAM-SHA-256 (RFC 5802/7677),
  *     run over Kafka's SaslHandshake v1 + SaslAuthenticate v0 framing
  *     (brokers ≥ 1.0; the pre-1.0 unframed-token flow is not spoken).
  *     GSSAPI/OAUTHBEARER are rejected loudly by name.
  */
final case class KafkaSecurity(
    tls: Boolean = false,
    tlsInsecure: Boolean = false,
    saslMechanism: Option[String] = None,
    username: String = "",
    password: String = "")

object KafkaSecurity {
  val Plaintext: KafkaSecurity = KafkaSecurity()

  def saslPlain(username: String, password: String,
                tls: Boolean = false, tlsInsecure: Boolean = false): KafkaSecurity =
    KafkaSecurity(tls, tlsInsecure, Some("PLAIN"), username, password)

  def saslScramSha256(username: String, password: String,
                      tls: Boolean = false, tlsInsecure: Boolean = false): KafkaSecurity =
    KafkaSecurity(tls, tlsInsecure, Some("SCRAM-SHA-256"), username, password)
}

/** SASL mechanism payloads, built from the RFCs (4616 PLAIN; 5802 SCRAM with
  * the SHA-256 parameters of 7677). Pure byte/string functions so
  * KafkaWireSpec pins them against the RFCs' published vectors without a
  * broker — the socket path in [[KafkaWire.authenticate]] goes through
  * exactly these.
  */
object KafkaSasl {

  /** RFC 4616: [authzid] NUL authcid NUL passwd (no authorization id). */
  def plainAuthBytes(username: String, password: String): Array[Byte] =
    ("\u0000" + username + "\u0000" + password).getBytes(UTF_8)

  /** Fresh printable nonce (RFC 5802: printable = %x21-2B / %x2D-7E, i.e.
    * no comma); base64 of SecureRandom bytes satisfies that.
    */
  def freshNonce(): String = {
    val b = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(b)
    Base64.getEncoder.encodeToString(b)
  }

  private def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }
  private def sha256(b: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(b)

  /** Hi(str, salt, i) = PBKDF2-HMAC-SHA256 (RFC 5802 §2.2). */
  def hi(password: String, salt: Array[Byte], iterations: Int): Array[Byte] = {
    val f = javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    f.generateSecret(new PBEKeySpec(password.toCharArray, salt, iterations, 256))
      .getEncoded
  }

  /** One SCRAM-SHA-256 client exchange (RFC 5802 message flow, RFC 7677
    * parameters). Stateful across the two messages because AuthMessage
    * spans both. The username is saslname-escaped (= → =3D, comma → =2C);
    * full SASLprep is NOT implemented — non-ASCII usernames/passwords are
    * rejected loudly rather than normalized wrongly (Kafka's own SCRAM
    * users are overwhelmingly ASCII; the reference inherits the same
    * normalization from the JDK SASL provider only for the username).
    */
  final class ScramClient(username: String, password: String,
                          val clientNonce: String) {
    require((username + password).forall(c => c >= 0x20 && c < 0x7f),
      "SCRAM without SASLprep: username/password must be printable ASCII")

    private def saslName(s: String): String =
      s.replace("=", "=3D").replace(",", "=2C")

    val clientFirstBare: String = s"n=${saslName(username)},r=$clientNonce"

    /** GS2 header "n,," (no channel binding) + bare. */
    def clientFirstMessage: String = "n,," + clientFirstBare

    private var serverSignatureB64: String = _

    /** Consumes server-first (`r=...,s=...,i=...`), returns client-final
      * with the proof. Throws on a server nonce that doesn't extend ours
      * (MITM reflection guard) or a sub-minimum iteration count.
      */
    def clientFinalMessage(serverFirstMessage: String): String = {
      val attrs = serverFirstMessage.split(",").map { a =>
        require(a.length >= 2 && a(1) == '=', s"malformed SCRAM attribute '$a'")
        a.substring(0, 1) -> a.substring(2)
      }.toMap
      val serverNonce = attrs.getOrElse("r",
        throw new IllegalArgumentException("server-first missing r="))
      require(serverNonce.startsWith(clientNonce) && serverNonce != clientNonce,
        "server nonce must extend the client nonce")
      val salt = Base64.getDecoder.decode(attrs.getOrElse("s",
        throw new IllegalArgumentException("server-first missing s=")))
      val iterations = attrs.getOrElse("i",
        throw new IllegalArgumentException("server-first missing i=")).toInt
      require(iterations >= 4096, s"iteration count $iterations below RFC 7677 minimum")

      val saltedPassword = hi(password, salt, iterations)
      val clientKey = hmacSha256(saltedPassword, "Client Key".getBytes(UTF_8))
      val storedKey = sha256(clientKey)
      // c=biws = base64("n,,"), the GS2 header echoed in the final message
      val withoutProof = s"c=biws,r=$serverNonce"
      val authMessage =
        (clientFirstBare + "," + serverFirstMessage + "," + withoutProof).getBytes(UTF_8)
      val clientSignature = hmacSha256(storedKey, authMessage)
      val proof = clientKey.zip(clientSignature).map { case (a, b) => (a ^ b).toByte }
      val serverKey = hmacSha256(saltedPassword, "Server Key".getBytes(UTF_8))
      serverSignatureB64 =
        Base64.getEncoder.encodeToString(hmacSha256(serverKey, authMessage))
      withoutProof + ",p=" + Base64.getEncoder.encodeToString(proof)
    }

    /** Verifies server-final (`v=...`) — MUTUAL authentication: a server
      * that doesn't know the (salted) password can't produce this, so the
      * client detects a spoofed broker even after it "accepted" the proof.
      */
    def verifyServerFinal(serverFinalMessage: String): Unit = {
      if (serverFinalMessage.startsWith("e="))
        throw new IllegalStateException(s"SCRAM server error: $serverFinalMessage")
      require(serverFinalMessage == s"v=$serverSignatureB64",
        "SCRAM server signature mismatch — broker does not know the password")
    }
  }
}
