package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** TTL eviction + global stateful op (SURVEY §2.9 — TransformStatefulP.java:
  * 48-120 wm-driven eviction with onEvictFn; GlobalMapStatefulTransform
  * parallelism-1 semantics).
  *
  * NB: with ProcessingTimeTimeout pending, Structured Streaming schedules
  * continuous no-data micro-batches to fire timers — `processAllAvailable`
  * never settles, so these tests poll the sink instead.
  */
class StatefulTtlSpec extends SparkSpec {

  import spark.implicits._

  private def eventually(ms: Long = 30000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + ms
    while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
    assert(cond, s"condition not met within ${ms}ms")
  }

  test("mapStateful TTL evicts idle keys and fires onEvictFn") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]

    val out = StatefulOps.mapStateful[String, (String, Long), Long, (String, Long)](
      mem.toDS(), _._1, ttlMillis = 300,
      createFn = () => 0L,
      mapFn = (k, acc, v) => { val a = acc + v._2; (a, (k, a)) },
      onEvictFn = (k, acc) => Some((s"evicted:$k", acc)))

    val job = StreamSinks.memory("ttl_test", "append").start(out.toDF())
    def rows = spark.table("ttl_test").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

    // both events in one batch -> running sum 3; the timer-poll batches then
    // fire a's TTL without further input
    mem.addData(("a", 1L), ("a", 2L))
    eventually() { rows.contains(("a", 3L)) }
    eventually() { rows.contains(("evicted:a", 3L)) }

    // state continues within a batch (one batch -> no TTL between events)
    mem.addData(("b", 10L), ("b", 1L))
    eventually() { rows.contains(("b", 11L)) }
    eventually() { rows.contains(("evicted:b", 11L)) }
    job.cancel()
  }

  test("filterStateful: first-N-per-key keeps state transitioning on drops") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    // keep only the first 2 events per key — the dedup/throttle shape
    val out = StatefulOps.filterStateful[String, (String, Long), Long](
      mem.toDS(), _._1, ttlMillis = 0,
      createFn = () => 0L,
      filterFn = (seen, _) => (seen + 1, seen < 2))
    val job = StreamSinks.memory("fs_test", "append").start(out.toDF())
    mem.addData(("a", 1L), ("a", 2L), ("a", 3L), ("b", 10L))
    job.processAllAvailable()
    mem.addData(("a", 4L), ("b", 20L), ("b", 30L))
    job.processAllAvailable()
    val rows = spark.table("fs_test").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    // a: first two only (3,4 dropped — state kept counting); b: first two
    assert(rows === Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L)))
    job.cancel()
  }

  test("flatMapStateful: buffered emit — zero or many outputs per event") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    // emit nothing until 3 values buffered per key, then flush the triple —
    // the micro-batching/assembly shape mapStateful can't express
    val out = StatefulOps.flatMapStateful[String, (String, Long), Seq[Long], (String, Long)](
      mem.toDS(), _._1, ttlMillis = 0,
      createFn = () => Nil,
      flatMapFn = (k, buf, v) => {
        val b = buf :+ v._2
        if (b.size >= 3) (Nil, b.map((k, _))) else (b, Nil)
      })
    val job = StreamSinks.memory("fms_test", "append").start(out.toDF())
    mem.addData(("a", 1L), ("a", 2L))
    job.processAllAvailable()
    assert(spark.table("fms_test").count() == 0, "flushed before 3 buffered")
    mem.addData(("a", 3L), ("b", 9L))
    job.processAllAvailable()
    val rows = spark.table("fms_test").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(rows === Seq(("a", 1L), ("a", 2L), ("a", 3L)), "triple flush for a only")
    job.cancel()
  }

  test("mapStatefulEventTime: watermark-driven eviction (Jet's TTL clock), deterministic") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val out = StatefulOps.mapStatefulEventTime[
        String, (String, java.sql.Timestamp, Long), Long, (String, Long)](
      mem.toDS(), _._1, _._2, ttlMillis = 10000L, watermarkDelay = "0 seconds",
      createFn = () => 0L,
      mapFn = (k, acc, v) => { val a = acc + v._3; (a, (k, a)) },
      onEvictFn = (k, acc) => Some((s"evicted:$k", acc)))
    val job = StreamSinks.memory("evt_ttl", "append").start(out.toDF())
    def rows = spark.table("evt_ttl").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

    // events at t=0s,2s for key a: running sums emit; no eviction yet
    mem.addData(("a", ts(0), 1L), ("a", ts(2), 2L))
    job.processAllAvailable()
    assert(rows.contains(("a", 3L)))
    assert(!rows.exists(_._1 == "evicted:a"), "no eviction before wm passes deadline")
    // watermark advances to t=5s (still before a's 12s deadline): no eviction
    mem.addData(("b", ts(5), 10L))
    job.processAllAvailable()
    assert(!rows.exists(_._1 == "evicted:a"))
    // watermark jumps past a's last-event(2s)+ttl(10s)=12s: a evicts, b does not
    mem.addData(("c", ts(14), 7L))
    job.processAllAvailable()
    // fMGWS fires event-time timeouts in the batch AFTER the wm-advancing one
    mem.addData(("c", ts(14), 0L))
    job.processAllAvailable()
    assert(rows.contains(("evicted:a", 3L)), s"a not evicted: $rows")
    assert(!rows.exists(_._1 == "evicted:b"), "b's deadline (15s) not passed")
    job.cancel()
  }

  test("mapStatefulEventTime: a late in-watermark event must not shorten the deadline") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Long)]
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val out = StatefulOps.mapStatefulEventTime[
        String, (String, java.sql.Timestamp, Long), Long, (String, Long)](
      mem.toDS(), _._1, _._2, ttlMillis = 10000L, watermarkDelay = "30 seconds",
      createFn = () => 0L,
      mapFn = (k, acc, v) => { val a = acc + v._3; (a, (k, a)) },
      onEvictFn = (k, acc) => Some((s"evicted:$k", acc)))
    val job = StreamSinks.memory("evt_late", "append").start(out.toDF())
    def rows = spark.table("evt_late").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

    mem.addData(("a", ts(100), 1L)) // deadline = 110 s
    job.processAllAvailable()
    mem.addData(("a", ts(75), 2L)) // LATE but within the 30 s watermark
    job.processAllAvailable()
    // wm -> 125-30 = 95 s: before a's 110 s deadline. The pre-fix code set
    // the deadline from the batch max (75+10=85 s) and evicted here.
    mem.addData(("z", ts(125), 0L))
    job.processAllAvailable()
    mem.addData(("z", ts(126), 0L))
    job.processAllAvailable()
    assert(rows.contains(("a", 3L)), s"late event must fold into state: $rows")
    assert(!rows.exists(_._1 == "evicted:a"),
      s"evicted before wm passed last-event+ttl: $rows")
    // wm -> 145-30 = 115 s > 110 s: now a evicts, with BOTH events' sum
    mem.addData(("z", ts(145), 0L))
    job.processAllAvailable()
    mem.addData(("z", ts(146), 0L))
    job.processAllAvailable()
    assert(rows.contains(("evicted:a", 3L)), s"not evicted after deadline: $rows")
    job.cancel()
  }

  test("mapStatefulGlobal: single global state across keys") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    // global sequence numbering — the canonical global-state use
    val out = StatefulOps.mapStatefulGlobal[String, Long, (String, Long)](
      mem.toDS(), () => 0L, (seq, v) => (seq + 1, (v, seq + 1)))
    val job = StreamSinks.memory("global_test", "append").start(out.toDF())
    mem.addData("x", "y")
    job.processAllAvailable()
    mem.addData("z")
    job.processAllAvailable()
    val seqs = spark.table("global_test").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(seqs.values.toSeq.sorted === Seq(1L, 2L, 3L))
    job.cancel()
  }
}
