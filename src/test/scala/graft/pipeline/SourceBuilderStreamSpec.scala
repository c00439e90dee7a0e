package graft.pipeline

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import graft.SparkSpec

/** Custom unbounded SourceBuilder (reference SourceBuilder.stream:236 /
  * timestampedStream:342): pump lifecycle (create once, fill drained, destroy
  * exactly once on stop) and event-time attachment at the source.
  */
class SourceBuilderStreamSpec extends SparkSpec {

  import spark.implicits._

  private def eventually(ms: Long = 30000)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + ms
    while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
    assert(cond, s"condition not met within ${ms}ms")
  }

  test("buildStream: fill drains through a query, destroy runs exactly once on stop") {
    val created = new AtomicInteger(0)
    val destroyed = new AtomicInteger(0)
    val cursor = new AtomicInteger(0)
    val built = Sources.buildStream[AtomicInteger, Int]()(
      () => { created.incrementAndGet(); cursor })(
      c => { val v = c.incrementAndGet(); if (v <= 3) Some(Seq(v)) else None })(
      _ => destroyed.incrementAndGet())(
      implicitly)(spark)
    val job = StreamSinks.memory("sb_stream", "append").start(built.df)
    eventually() { spark.table("sb_stream").count() == 3 }
    assert(spark.table("sb_stream").as[Int].collect().sorted === Seq(1, 2, 3))
    built.stop()
    built.stop() // idempotent
    assert(created.get() == 1, "create must run once")
    assert(destroyed.get() == 1, "destroy must run exactly once")
    job.cancel()
  }

  test("buildTimestampedStream: source-attached event time drives a watermark window") {
    val done = new AtomicBoolean(false)
    // three events at minute offsets 0, 1, 10 — a 2-minute tumbling window
    // over the SOURCE-ATTACHED timestamps must put the first two together
    val built = Sources.buildTimestampedStream[AtomicBoolean, Long]()(
      () => done)(
      d => if (d.compareAndSet(false, true)) Some(Seq(0L, 60L, 600L)) else None)(
      // base must be 2-minute-aligned (windows align to epoch): 1.7e12 is
      // +80 s into its window, which would split the 0 s/60 s pair
      timestampFn = s => 1700000040000L + s * 1000L)(
      implicitly)(spark)
    import org.apache.spark.sql.functions._
    val agged = built.df
      .withWatermark("timestamp", "1 minute")
      .groupBy(window(col("timestamp"), "2 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("n"))
    val job = StreamSinks.memory("sb_ts_stream", "complete").start(agged)
    eventually() {
      spark.table("sb_ts_stream").as[Long].collect().sorted.toSeq == Seq(1L, 2L)
    }
    built.stop()
    job.cancel()
  }
}
