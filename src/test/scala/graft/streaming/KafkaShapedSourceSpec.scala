package graft.streaming

import graft.SparkSpec
import graft.pipeline.{InMemoryTxnBroker, KafkaShapedSink}

/** The consumer half of the kafka-shaped exactly-once story: offsets are
  * checkpointed, restart seeks to them, and read_committed isolation keeps
  * aborted / in-flight producer transactions invisible — the
  * `StreamKafkaP` snapshot-seek contract executed against the stub broker
  * (the producer half is KafkaShapedSinkSpec).
  */
class KafkaShapedSourceSpec extends SparkSpec {

  private var n = 0
  private def fresh(): (String, InMemoryTxnBroker) = {
    n += 1
    val name = s"ksrc_${System.nanoTime()}_$n"
    (name, InMemoryTxnBroker.named(name))
  }

  private def produce(b: InMemoryTxnBroker, topic: String, id: String,
                      batch: Long, rows: String*): Unit =
    KafkaShapedSink.deliverPartition(b.producer(id), topic, batch, rows.iterator)

  private def startQuery(broker: String, topic: String, sinkTable: String,
                         ckpt: String) =
    spark.readStream.format("graft.streaming.KafkaShapedSource")
      .option("broker", broker).option("topic", topic).load()
      .writeStream.format("memory").queryName(sinkTable)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

  test("read_committed: only committed transactions' records are ever emitted") {
    val (name, b) = fresh()
    produce(b, "t", "p0", 0L, "a", "b")
    // an in-flight (never committed) transaction from another producer
    val zombie = b.producer("p1")
    zombie.initTransactions()
    zombie.beginTransaction()
    zombie.send("t", "UNCOMMITTED")
    // an aborted transaction
    val aborter = b.producer("p2")
    aborter.initTransactions()
    aborter.beginTransaction()
    aborter.send("t", "ABORTED")
    aborter.abortTransaction()

    val ckpt = java.nio.file.Files.createTempDirectory("graft_ksrc_rc_").toString
    val q = startQuery(name, "t", "ksrc_rc", ckpt)
    try {
      q.processAllAvailable()
      val vals = spark.table("ksrc_rc").collect().map(_.getString(1)).toSet
      assert(vals === Set("a", "b"), s"read_committed violated: $vals")
    } finally q.stop()
  }

  test("kill + restart resumes from the checkpointed offset: exactly-once consumption") {
    // memory sinks don't support checkpoint recovery — use the recording
    // foreach sink (AtLeastOnceEventModeSpec's instrument), one queue per
    // incarnation so post-restart deliveries are observed in isolation
    import AtLeastOnceEventModeSpec.{queues, RecordingWriter}
    import java.util.concurrent.ConcurrentLinkedQueue
    val (name, b) = fresh()
    produce(b, "t", "p0", 0L, "r0", "r1", "r2")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ksrc_eo_").toString
    def run(sinkId: String) = {
      queues.computeIfAbsent(sinkId, _ => new ConcurrentLinkedQueue[Long])
      spark.readStream.format("graft.streaming.KafkaShapedSource")
        .option("broker", name).option("topic", "t").load()
        .selectExpr("offset AS value")
        .writeStream.foreach(new RecordingWriter(sinkId))
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
    }
    val q1 = run("ksrc_eo_1")
    try {
      q1.processAllAvailable()
      assert(queues.get("ksrc_eo_1").size === 3)
    } finally q1.stop() // "crash" after the offset log recorded the batch

    // more records arrive while the consumer is down
    produce(b, "t", "p0", 1L, "r3", "r4")
    val q2 = run("ksrc_eo_2")
    try {
      q2.processAllAvailable()
      // the checkpoint seek must hand the restarted incarnation offsets
      // 3 and 4 only — re-emitting 0..2 would be the duplication bug
      val got = {
        val it = queues.get("ksrc_eo_2").iterator
        val buf = Vector.newBuilder[Long]
        while (it.hasNext) buf += it.next()
        buf.result().sorted
      }
      assert(got === Vector(3L, 4L), s"restart must resume at offset 3, got $got")
    } finally {
      q2.stop()
      queues.remove("ksrc_eo_1")
      queues.remove("ksrc_eo_2")
      ()
    }
  }

  test("end-to-end exactly-once loop: transactional produce -> read_committed consume, with a producer crash window") {
    val (name, b) = fresh()
    // batch 0 commits; a first attempt of batch 1 dies mid-transaction
    produce(b, "t", "p0", 0L, "x0")
    val dying = b.producer("p0")
    dying.initTransactions()
    dying.beginTransaction()
    dying.send("t", "x1-attempt1")
    // crash here: no commit. The replay (new incarnation, same id) fences
    // the zombie, aborts its transaction, and re-sends batch 1
    produce(b, "t", "p0", 1L, "x1")
    // a replay of an ALREADY-committed batch is skipped by the marker
    produce(b, "t", "p0", 1L, "x1")

    val ckpt = java.nio.file.Files.createTempDirectory("graft_ksrc_e2e_").toString
    val q = startQuery(name, "t", "ksrc_e2e", ckpt)
    try {
      q.processAllAvailable()
      val vals = spark.table("ksrc_e2e").collect().map(_.getString(1)).toSeq.sorted
      assert(vals === Seq("x0", "x1"),
        s"exactly one copy of each logical record, no zombie leakage: $vals")
    } finally q.stop()
  }
}
