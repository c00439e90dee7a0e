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
