package graft.pipeline

import graft.SparkSpec
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Connector adapter semantics that ARE runnable in the sandbox: the JMS
  * source/sink adapters drive the tested buildStream/foreachBatch machinery
  * with an in-memory stand-in for the user's JMS session — everything but
  * the wire. Kinesis/Elastic surfaces are compile-checked passthroughs
  * (README connector matrix documents their runtime packages).
  */
class ConnectorsSpec extends SparkSpec {

  import spark.implicits._

  private def eventually(ms: Long = 30000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + ms
    while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
    assert(cond, s"condition not met within ${ms}ms")
  }

  test("jmsQueue adapter: connect/receive/close lifecycle delivers queued messages") {
    val q = new ConcurrentLinkedQueue[String]()
    q.add("m1"); q.add("m2"); q.add("m3")
    val closed = new java.util.concurrent.atomic.AtomicInteger(0)
    val built = Connectors.jmsQueue[ConcurrentLinkedQueue[String], String](
      "orders", name => { assert(name == "orders"); q })(
      session => Option(session.poll()).map(Seq(_)))(
      _ => closed.incrementAndGet())(implicitly)(spark)
    val job = StreamSinks.memory("jms_in", "append").start(built.df)
    eventually() { spark.table("jms_in").count() == 3 }
    assert(spark.table("jms_in").as[String].collect().sorted === Seq("m1", "m2", "m3"))
    built.stop()
    assert(closed.get() == 1, "close must run exactly once")
    job.cancel()
  }

  test("jmsSink adapter: per-partition connect/send/close, at-least-once delivery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val job = Connectors.jmsSink[String]("outq",
      name => { ConnectorsSpec.sent.add(s"open:$name"); name })(
      (_, row) => { ConnectorsSpec.sent.add(row.getString(0)); () })(
      name => { ConnectorsSpec.sent.add(s"close:$name"); () })
      .start(mem.toDF)
    mem.addData("a", "b")
    job.processAllAvailable()
    job.cancel()
    val all = ConnectorsSpec.sent.toArray(Array.empty[String]).toSeq
    assert(all.count(_ == "a") >= 1 && all.count(_ == "b") >= 1)
    assert(all.count(_.startsWith("open:")) == all.count(_.startsWith("close:")),
      "every connect must be closed")
  }
}

object ConnectorsSpec {
  // executor-visible collector (local-mode same-JVM, like the broker stub)
  val sent = new ConcurrentLinkedQueue[String]()
}
