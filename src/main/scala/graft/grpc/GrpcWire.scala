package graft.grpc

import io.netty.buffer.{ByteBuf, Unpooled}

/** The gRPC WIRE formats, built from the public specs alone (gRPC
  * `PROTOCOL-HTTP2.md` + the protobuf encoding doc) — no grpc-java:
  *
  *  - [[GrpcFraming]]: the length-prefixed message framing every gRPC DATA
  *    stream carries — 1 compressed-flag byte + 4-byte big-endian length +
  *    payload, messages free to span / share HTTP/2 DATA frames;
  *  - [[ProtoLite]]: a minimal protobuf codec for the `string payload = 1;`
  *    message shape the seam's echo/transform services use (tag byte
  *    `0x0A` = field 1 wire-type 2, varint length, UTF-8 bytes).
  *
  * This module exists to EXERCISE the §2.4 gRPC seam (reference
  * extensions/grpc GrpcServices.java) against a real HTTP/2 socket in the
  * zero-egress sandbox; a production deployment swaps in grpc-java stubs —
  * the service-transform side ([[graft.pipeline.BatchStage
  * .mapUsingServiceAsync]] and friends) is identical either way.
  */
object GrpcFraming {

  /** One message → its length-prefixed gRPC frame. */
  def encode(msg: Array[Byte]): ByteBuf = {
    val buf = Unpooled.buffer(5 + msg.length)
    buf.writeByte(0) // compressed flag: identity
    buf.writeInt(msg.length)
    buf.writeBytes(msg)
    buf
  }

  /** Incremental decoder: feed DATA-frame payloads, take complete messages.
    * Messages may span frames and several may arrive in one frame — the
    * buffer carries the remainder.
    */
  final class Decoder {
    private var buf: Array[Byte] = Array.emptyByteArray

    def feed(data: ByteBuf): Seq[Array[Byte]] = {
      val in = new Array[Byte](data.readableBytes())
      data.readBytes(in)
      buf = buf ++ in
      val out = Seq.newBuilder[Array[Byte]]
      var continue = true
      while (continue && buf.length >= 5) {
        require(buf(0) == 0, "compressed gRPC frames not supported")
        val len = ((buf(1) & 0xff) << 24) | ((buf(2) & 0xff) << 16) |
          ((buf(3) & 0xff) << 8) | (buf(4) & 0xff)
        if (buf.length >= 5 + len) {
          out += buf.slice(5, 5 + len)
          buf = buf.drop(5 + len)
        } else continue = false
      }
      out.result()
    }
  }
}

/** Minimal protobuf: `message Echo { string payload = 1; }`. */
object ProtoLite {

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Int): Unit = {
    var v = v0
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
  }

  def encodeString(s: String): Array[Byte] = {
    val bytes = s.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(bytes.length + 6)
    out.write(0x0a) // field 1, wire type 2 (length-delimited)
    writeVarint(out, bytes.length)
    out.write(bytes)
    out.toByteArray
  }

  def decodeString(msg: Array[Byte]): String = {
    require(msg.length >= 2 && msg(0) == 0x0a,
      s"expected field-1 string message, got ${msg.take(2).toSeq}")
    var i = 1
    var len = 0
    var shift = 0
    var cont = true
    while (cont) {
      val b = msg(i); i += 1
      len |= (b & 0x7f) << shift
      shift += 7
      cont = (b & 0x80) != 0
    }
    new String(msg, i, len, "UTF-8")
  }
}
