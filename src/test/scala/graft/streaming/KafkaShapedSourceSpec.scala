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

  // ------------------------------------------------ multi-partition cases

  test("multi-partition: per-partition order preserved, cross-partition interleave free") {
    val (name, b) = fresh()
    b.ensurePartitions("t", 3)
    // skewed: p0 gets 4 records over two transactions, p1 one, p2 none
    val prod = b.producer("mp0")
    prod.initTransactions()
    prod.beginTransaction()
    prod.send("t", 0, "a0"); prod.send("t", 0, "a1"); prod.send("t", 1, "b0")
    prod.commitTransaction()
    prod.beginTransaction()
    prod.send("t", 0, "a2"); prod.send("t", 0, "a3")
    prod.commitTransaction()

    val ckpt = java.nio.file.Files.createTempDirectory("graft_ksrc_mp_").toString
    val q = startQuery(name, "t", "ksrc_mp", ckpt)
    try {
      q.processAllAvailable()
      val rows = spark.table("ksrc_mp").collect()
        .map(r => (r.getInt(2), r.getLong(0), r.getString(1)))
      // per-partition offsets are dense and ordered by send order
      assert(rows.filter(_._1 == 0).sortBy(_._2).map(_._3).toSeq
        === Seq("a0", "a1", "a2", "a3"), "p0 order = send order")
      assert(rows.filter(_._1 == 1).sortBy(_._2).map(_._3).toSeq === Seq("b0"))
      assert(!rows.exists(_._1 == 2), "idle partition emits nothing")
    } finally q.stop()
  }

  test("multi-partition: restart seeks EACH partition to its own checkpointed offset") {
    import AtLeastOnceEventModeSpec.{queues, RecordingWriter}
    import java.util.concurrent.ConcurrentLinkedQueue
    val (name, b) = fresh()
    b.ensurePartitions("t", 2)
    val prod = b.producer("mp1")
    prod.initTransactions()
    prod.beginTransaction()
    prod.send("t", 0, "10"); prod.send("t", 0, "11"); prod.send("t", 0, "12")
    prod.send("t", 1, "20")
    prod.commitTransaction() // p0 at offset 3, p1 at offset 1
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ksrc_mps_").toString
    def run(sinkId: String) = {
      queues.computeIfAbsent(sinkId, _ => new ConcurrentLinkedQueue[Long])
      spark.readStream.format("graft.streaming.KafkaShapedSource")
        .option("broker", name).option("topic", "t").load()
        .selectExpr("CAST(value AS LONG) AS value")
        .writeStream.foreach(new RecordingWriter(sinkId))
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
    }
    val q1 = run("ksrc_mps_1")
    try {
      q1.processAllAvailable()
      assert(queues.get("ksrc_mps_1").size === 4)
    } finally q1.stop()
    // while down: p1 advances two records, p0 one — asymmetric progress
    prod.beginTransaction()
    prod.send("t", 1, "21"); prod.send("t", 1, "22"); prod.send("t", 0, "13")
    prod.commitTransaction()
    val q2 = run("ksrc_mps_2")
    try {
      q2.processAllAvailable()
      val got = {
        val it = queues.get("ksrc_mps_2").iterator
        val buf = Vector.newBuilder[Long]
        while (it.hasNext) buf += it.next()
        buf.result().sorted
      }
      // only the post-checkpoint records of EACH partition — a global (or
      // wrong-partition) seek would re-emit 10..12 or skip 21
      assert(got === Vector(13L, 21L, 22L), s"per-partition seek broken: $got")
    } finally {
      q2.stop()
      queues.remove("ksrc_mps_1"); queues.remove("ksrc_mps_2")
      ()
    }
  }

  test("idle partition does not hold back the event-time watermark (windows still close)") {
    val (name, b) = fresh()
    b.ensurePartitions("t", 3) // p2 stays idle for the whole test
    def sendAt(prod: graft.pipeline.TxnProducerApi, p: Int, epochSec: Long*) = {
      prod.beginTransaction()
      epochSec.foreach(t => prod.send("t", p, t.toString))
      prod.commitTransaction()
    }
    val prod = b.producer("idle0")
    prod.initTransactions()
    sendAt(prod, 0, 10L, 70L)
    sendAt(prod, 1, 20L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ksrc_idle_").toString
    // append-mode tumbling window: emits a window ONLY once the watermark
    // passes its end. The reference's per-partition-min watermark would
    // stall at the idle p2 forever without idle-partition exclusion
    // (EventTimeMapper.java:52-64); Spark's global watermark advances from
    // whatever rows arrived, so the idle partition is naturally excluded.
    import org.apache.spark.sql.functions._
    val q = spark.readStream.format("graft.streaming.KafkaShapedSource")
      .option("broker", name).option("topic", "t").load()
      .select(timestamp_seconds(col("value").cast("long")).as("ts"))
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .count()
      .select(unix_timestamp(col("window.start")).as("ws"), col("count"))
      .writeStream.format("memory").queryName("ksrc_idle")
      .option("checkpointLocation", s"$ckpt/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // next batch: ts=200 on p0 pushes the watermark past window [60,120)
      sendAt(prod, 0, 200L)
      q.processAllAvailable()
      sendAt(prod, 0, 300L) // and one more to flush [180, 240) is NOT needed;
      q.processAllAvailable() // [0,60) and [60,120) must both be closed now
      val got = spark.table("ksrc_idle").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((0L, 2L)) && got.contains((60L, 1L)),
        s"windows must close despite idle p2: $got")
    } finally q.stop()
  }

  test("partition discovery: a partition added mid-stream is read from offset 0") {
    val (name, b) = fresh()
    b.ensurePartitions("t", 2)
    val prod = b.producer("disc0")
    prod.initTransactions()
    prod.beginTransaction()
    prod.send("t", 0, "a"); prod.send("t", 1, "b")
    prod.commitTransaction()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ksrc_disc_").toString
    val q = startQuery(name, "t", "ksrc_disc", ckpt)
    try {
      q.processAllAvailable()
      assert(spark.table("ksrc_disc").collect().map(_.getString(1)).toSet
        === Set("a", "b"))
      // the topic grows mid-job (kafka-topics --alter); records land on the
      // new partition BEFORE the source's next offset fetch
      b.ensurePartitions("t", 3)
      prod.beginTransaction()
      prod.send("t", 2, "c0"); prod.send("t", 2, "c1"); prod.send("t", 0, "a1")
      prod.commitTransaction()
      q.processAllAvailable()
      val rows = spark.table("ksrc_disc").collect()
        .map(r => (r.getInt(2), r.getLong(0), r.getString(1))).toSet
      assert(rows.contains((2, 0L, "c0")) && rows.contains((2, 1L, "c1")),
        s"discovered partition must be read from 0: $rows")
      assert(rows.contains((0, 1L, "a1")))
    } finally q.stop()
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
