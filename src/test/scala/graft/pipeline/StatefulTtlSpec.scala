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
