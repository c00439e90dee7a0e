package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** mapStatefulTws — Jet's keyed mapStateful(ttl, onEvict) on Spark 4's
  * native transformWithState/StatefulProcessor API (explicit ValueState +
  * registered timers; RocksDB-backed, which the API requires). Asserts the
  * SAME contract StatefulTtlSpec pins for the fMGWS implementation: running
  * state per key, timer-driven eviction firing onEvictFn, key isolation.
  */
class TwsStatefulSpec extends SparkSpec {

  import spark.implicits._

  private def eventually(ms: Long = 60000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + ms
    while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
    assert(cond, s"condition not met within ${ms}ms")
  }

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("transformWithState mapStateful: running sums, timer eviction fires onEvictFn") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, Long)]
      val out = StatefulOps.mapStatefulTws[String, (String, Long), Long, (String, Long)](
        mem.toDS(), _._1, ttlMillis = 300,
        createFn = () => 0L,
        mapFn = (k, acc, v) => { val a = acc + v._2; (a, (k, a)) },
        onEvictFn = (k, acc) => Some((s"evicted:$k", acc)))
      val job = StreamSinks.memory("tws_ttl", "append").start(out.toDF())
      def rows = spark.table("tws_ttl").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq

      mem.addData(("a", 1L), ("a", 2L))
      eventually() { rows.contains(("a", 3L)) }
      // the registered processing-time timer fires without further input
      eventually() { rows.contains(("evicted:a", 3L)) }

      // a fresh key after eviction starts from createFn again
      mem.addData(("a", 5L))
      eventually() { rows.contains(("a", 5L)) }
      job.cancel()
    }
  }

  test("transformWithState event-time TTL: watermark-driven eviction, deterministic") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
      def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
      val out = StatefulOps.mapStatefulTwsEventTime[
          String, (String, java.sql.Timestamp, Long), Long, (String, Long)](
        mem.toDS(), _._1, _._2, ttlMillis = 10000L, watermarkDelay = "0 seconds",
        createFn = () => 0L,
        mapFn = (k, acc, v) => { val a = acc + v._3; (a, (k, a)) },
        onEvictFn = (k, acc) => Some((s"evicted:$k", acc)))
      val job = StreamSinks.memory("tws_evt", "append").start(out.toDF())
      def rows = spark.table("tws_evt").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq

      mem.addData(("a", ts(0), 1L), ("a", ts(2), 2L))
      job.processAllAvailable()
      assert(rows.contains(("a", 3L)))
      assert(!rows.exists(_._1 == "evicted:a"), "no eviction before wm passes deadline")
      // wm → 5 s: before a's 2s+10s=12s deadline
      mem.addData(("b", ts(5), 10L))
      job.processAllAvailable()
      assert(!rows.exists(_._1 == "evicted:a"))
      // wm jumps past 12 s: a evicts, b (deadline 15 s) does not; event-time
      // timers fire in the batch AFTER the wm-advancing one, same as fMGWS
      mem.addData(("c", ts(14), 7L))
      job.processAllAvailable()
      mem.addData(("c", ts(14), 0L))
      job.processAllAvailable()
      assert(rows.contains(("evicted:a", 3L)), s"a not evicted: $rows")
      assert(!rows.exists(_._1 == "evicted:b"), "b's deadline (15s) not passed")
      // a late-but-in-watermark event for an evicted key restarts from createFn
      job.cancel()
    }
  }

  test("transformWithState event-time TTL: state, timers, and eviction survive checkpoint restart") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("graft_tws_ckpt_").toString
      val (outDir, ckpt) = (s"$dir/out", s"$dir/checkpoint")
      def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
      val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
      def pipeline() = StatefulOps.mapStatefulTwsEventTime[
          String, (String, java.sql.Timestamp, Long), Long, (String, Long)](
        mem.toDS(), _._1, _._2, ttlMillis = 10000L, watermarkDelay = "0 seconds",
        createFn = () => 0L,
        mapFn = (k, acc, v) => { val a = acc + v._3; (a, (k, a)) },
        onEvictFn = (k, acc) => Some((s"evicted:$k", acc))).toDF("k", "v")

      // run 1: build state for a (sum 3, deadline 12 s), then stop mid-stream
      mem.addData(("a", ts(0), 1L), ("a", ts(2), 2L))
      val job1 = StreamSinks.files(outDir, ckpt).start(pipeline())
      job1.processAllAvailable()
      job1.cancel()

      // run 2 from the checkpoint: state must restore (a continues 3→7, not
      // 4) and the event-time timer must still evict at wm > 12 s exactly —
      // replay-deterministic because the clock is the watermark, not wall
      mem.addData(("a", ts(4), 4L))
      val job2 = StreamSinks.files(outDir, ckpt).start(pipeline())
      job2.processAllAvailable()
      mem.addData(("z", ts(30), 0L)) // wm → 30 s, past a's 4s+10s deadline
      job2.processAllAvailable()
      mem.addData(("z", ts(31), 0L)) // timer fires the batch after
      job2.processAllAvailable()
      job2.cancel()

      val rows = spark.read.parquet(outDir).as[(String, Long)].collect().toSeq
      assert(rows.count(_ == ("a", 3L)) == 1 && rows.count(_ == ("a", 7L)) == 1,
        s"restored state must continue 3→7 with no duplicates: $rows")
      assert(rows.contains(("evicted:a", 7L)),
        s"watermark-driven eviction must fire after restart with restored state: $rows")
      assert(!rows.contains(("a", 4L)), s"state reset at restart: $rows")
    }
  }

  test("transformWithState mapStateful: keys evolve independently, no ttl = no eviction") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(String, Long)]
      val out = StatefulOps.mapStatefulTws[String, (String, Long), Long, (String, Long)](
        mem.toDS(), _._1, ttlMillis = 0,
        createFn = () => 0L,
        mapFn = (k, acc, v) => { val a = acc + v._2; (a, (k, a)) })
      val job = StreamSinks.memory("tws_keys", "append").start(out.toDF())
      def rows = spark.table("tws_keys").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet

      mem.addData(("x", 1L), ("y", 10L))
      job.processAllAvailable()
      mem.addData(("x", 2L), ("y", 20L))
      job.processAllAvailable()
      assert(rows.contains(("x", 3L)) && rows.contains(("y", 30L)),
        s"per-key running sums wrong: $rows")
      assert(!rows.exists(_._1.startsWith("evicted:")), "no eviction without ttl")
      job.cancel()
    }
  }
}
