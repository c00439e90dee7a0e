package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** SigV4 against the PUBLIC test vector from the AWS General Reference
  * ("Signature Version 4 signing process — complete example": the
  * GET iam.amazonaws.com ListUsers request with the documented example
  * credentials). Every intermediate artifact — canonical request hash,
  * string-to-sign, final signature — is pinned to the values AWS publishes,
  * so the signer is verified end-to-end without network access; the
  * env-gated LiveWireSpec then uses it against a real endpoint.
  */
class SigV4Spec extends AnyFunSuite {

  private val amzDate = "20150830T123600Z"
  private val headers = Seq(
    "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
    "host" -> "iam.amazonaws.com",
    "x-amz-date" -> amzDate)
  private val secret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"

  test("canonical request matches AWS's documented hash") {
    val canonical = SigV4.canonicalRequest(
      "GET", "/", "Action=ListUsers&Version=2010-05-08",
      headers, SigV4.hexSha256(Array.emptyByteArray))
    assert(SigV4.hexSha256(canonical.getBytes("UTF-8")) ===
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("string-to-sign and final signature match AWS's documented values") {
    val canonical = SigV4.canonicalRequest(
      "GET", "/", "Action=ListUsers&Version=2010-05-08",
      headers, SigV4.hexSha256(Array.emptyByteArray))
    val toSign = SigV4.stringToSign(amzDate,
      "20150830/us-east-1/iam/aws4_request", canonical)
    assert(toSign ===
      """AWS4-HMAC-SHA256
        |20150830T123600Z
        |20150830/us-east-1/iam/aws4_request
        |f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59""".stripMargin)
    val sig = SigV4.signature(secret, "20150830", "us-east-1", "iam", toSign)
    assert(sig === "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("authorization header carries scope, signed headers, and the signature") {
    val auth = SigV4.authorization(
      SigV4.Credentials("AKIDEXAMPLE", secret), "us-east-1", "iam",
      "GET", "/", "Action=ListUsers&Version=2010-05-08",
      headers, Array.emptyByteArray, amzDate)
    assert(auth ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }
}
