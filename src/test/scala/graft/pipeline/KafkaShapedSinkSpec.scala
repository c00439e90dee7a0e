package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Kafka-shaped 2PC adapter (KafkaShapedSink): the reference's Kafka EOS
  * protocol (KafkaSinks.java:55-66 — transactions tied to snapshots, via
  * TwoPhaseSnapshotCommitUtility) exercised against the stub broker through
  * every failure window: replay of a committed batch, crash between send
  * and commit, and zombie-producer fencing.
  */
class KafkaShapedSinkSpec extends SparkSpec {

  import spark.implicits._

  private var n = 0
  private def freshBroker(): (String, InMemoryTxnBroker) = {
    n += 1
    val name = s"spec_broker_$n-${System.nanoTime()}"
    (name, InMemoryTxnBroker.named(name))
  }

  test("streaming sink delivers every micro-batch's rows exactly once (read_committed)") {
    implicit val sqlCtx = spark.sqlContext
    val (name, broker) = freshBroker()
    val mem = MemoryStream[Long]
    val job = KafkaShapedSink.sink(name, "eos", "out").start(mem.toDF)
    mem.addData(1L, 2L)
    job.processAllAvailable()
    mem.addData(3L)
    job.processAllAvailable()
    job.cancel()
    val seen = broker.visible("out").map(_.filter(_.isDigit).toLong).sorted
    assert(seen == Seq(1L, 2L, 3L))
  }

  test("replayed committed batch is skipped whole (progress marker is atomic with data)") {
    val (name, broker) = freshBroker()
    val batch = Seq(10L, 11L).toDF("v")
    KafkaShapedSink.writeBatch(name, "replay", "t", 0L, batch)
    assert(broker.visible("t").size == 2)
    // foreachBatch redelivers batch 0 after a restart → no duplicates
    KafkaShapedSink.writeBatch(name, "replay", "t", 0L, batch)
    assert(broker.visible("t").size == 2)
    // a LATER batch still goes through
    KafkaShapedSink.writeBatch(name, "replay", "t", 1L, Seq(12L).toDF("v"))
    assert(broker.visible("t").size == 3)
  }

  test("crash between send and commit leaves nothing visible; replay is exactly-once") {
    val (name, broker) = freshBroker()
    val p1 = broker.producer("crash-p0")
    p1.initTransactions()
    p1.beginTransaction()
    p1.send("t", "a"); p1.send("t", "b")
    // crash here: no commit — records must be invisible to read_committed
    assert(broker.visible("t").isEmpty)
    // recovery: a fresh incarnation replays the batch through the protocol
    val p2 = broker.producer("crash-p0")
    KafkaShapedSink.deliverPartition(p2, "t", 0L, Iterator("a", "b"))
    assert(broker.visible("t").sorted == Seq("a", "b"))
    // the first incarnation is now a zombie: its commit must be rejected
    intercept[ProducerFenced] { p1.commitTransaction() }
    assert(broker.visible("t").sorted == Seq("a", "b"))
  }

  test("initTransactions aborts the previous incarnation's in-flight transaction") {
    val (name, broker) = freshBroker()
    val p1 = broker.producer("fence-p0")
    p1.initTransactions()
    p1.beginTransaction()
    p1.send("t", "stale")
    val p2 = broker.producer("fence-p0")
    p2.initTransactions() // fences p1, aborts its open transaction
    intercept[ProducerFenced] { p1.send("t", "more") }
    p2.beginTransaction(); p2.send("t", "fresh"); p2.commitTransaction()
    assert(broker.visible("t") == Seq("fresh"))
  }

  test("failed delivery aborts its transaction and can be retried cleanly") {
    val (name, broker) = freshBroker()
    val boom = new RuntimeException("mid-batch failure")
    val failing = Iterator("x") ++ { throw boom; Iterator.empty[String] }
    val p = broker.producer("retry-p0")
    val e = intercept[RuntimeException] {
      KafkaShapedSink.deliverPartition(p, "t", 0L, failing)
    }
    assert(e eq boom)
    assert(broker.visible("t").isEmpty, "aborted txn must leave nothing visible")
    KafkaShapedSink.deliverPartition(broker.producer("retry-p0"), "t", 0L, Iterator("x"))
    assert(broker.visible("t") == Seq("x"))
  }
}
