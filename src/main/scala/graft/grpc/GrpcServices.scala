package graft.grpc

import graft.pipeline.ServiceFactory

/** Reference-parity gRPC service factories (extensions/grpc/src/main/java/
  * com/hazelcast/jet/grpc/GrpcServices.java — `unaryService` at :103,
  * `bidirectionalStreamingService` at :164): a [[ServiceFactory]] whose
  * service is a live gRPC channel, one per processor/partition, destroyed
  * with the task — exactly the reference's channel-per-processor scheme.
  * Plug into `mapUsingServiceAsync` (unary, the sliding in-flight ring) or
  * `mapUsingServiceAsyncBatched` (one bidi stream per batch).
  *
  * String-typed convenience wrappers ride the [[ProtoLite]]
  * `string payload = 1;` message; byte-level callers can use the client
  * directly.
  */
object GrpcServices {

  /** Channel factory: create = connect, destroy = close. */
  def channel(host: String, port: Int): ServiceFactory[GrpcShapedClient] =
    ServiceFactory(() => new GrpcShapedClient(host, port), _.close())

  /** Unary call returning the decoded string payload. */
  def unaryString(svc: GrpcShapedClient, path: String, payload: String)
      : scala.concurrent.Future[String] = {
    import scala.concurrent.ExecutionContext.Implicits.global
    svc.unary(path, ProtoLite.encodeString(payload)).map(ProtoLite.decodeString)
  }

  /** One bidi stream per batch of string payloads (the reference's
    * bidirectional-streaming shape: requests stream out, responses stream
    * back in order on the same stream).
    */
  def bidiStrings(svc: GrpcShapedClient, path: String, payloads: Seq[String])
      : scala.concurrent.Future[Seq[String]] = {
    import scala.concurrent.ExecutionContext.Implicits.global
    svc.bidi(path, payloads.map(ProtoLite.encodeString))
      .map(_.map(ProtoLite.decodeString))
  }
}
