package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Jet `earlyResultsPeriod` parity (WindowDefinition.java:39-70,
  * SlidingWindowP.java:184-192): Jet emits periodic partial window results
  * before the watermark closes the window. Spark's equivalent is **update
  * output mode**: every micro-batch emits the windows whose aggregate changed
  * — same observable contract (partial results superseded by the final one),
  * paced by micro-batches instead of a wall-clock period (SURVEY §7.3/§7.4
  * decision).
  */
class EarlyResultsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("update mode emits partial window results before the window closes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]

    val agged = new StreamSourceStage(mem.toDF.toDF("ts", "v"))
      .withTimestamps("ts", "10 minutes")
      .window(WindowDefinition.tumbling("1 hour"))
      .aggregate(AggregateOperations.allOf(
        AggregateOperations.counting("n"),
        AggregateOperations.summingDouble(col("v"), "s")))

    // update mode = early results: each micro-batch re-emits the changed window
    val job = StreamSinks.memory("early_test", "update").start(agged)

    mem.addData((ts("2024-01-01 00:05:00"), 1.0))
    job.processAllAvailable()
    val early = spark.table("early_test").select("n", "s").collect()
    assert(early.length === 1 && early(0).getLong(0) === 1) // partial result emitted

    mem.addData((ts("2024-01-01 00:20:00"), 2.0))
    job.processAllAvailable()
    // the same window was re-emitted with the updated aggregate (Jet early
    // result followed by a fresher one); memory sink in update mode appends,
    // so both emissions are visible
    val all = spark.table("early_test").select("n", "s").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(all.toSeq === Seq((1L, 1.0), (2L, 3.0)))
    job.cancel()
  }

  test("timer-driven early results: >=2 wall-clock partials, then the final, in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]

    // 1-hour tumbling window on key, 800 ms early-results period
    val out = EarlyWindowOps.tumblingEarly[String, (Timestamp, String, Double),
        (Long, Double), (String, Long, Boolean, Long, Double)](
      mem.toDF.toDF("ts", "k", "v").withWatermark("ts", "10 minutes")
        .as[(Timestamp, String, Double)],
      tsFn = _._1, keyFn = _._2,
      windowMillis = 3600L * 1000, earlyPeriodMillis = 800,
      zero = (0L, 0.0),
      acc = (a, v) => (a._1 + 1, a._2 + v._3),
      export = (k, ws, _, early, a) => (k, ws, early, a._1, a._2))

    val job = out.toDF.toDF("k", "window_start", "is_early", "n", "s")
      .writeStream.format("memory").queryName("early_timer_test")
      .outputMode("append").start()

    // with a ProcessingTimeTimeout pending the engine schedules continuous
    // no-data micro-batches to fire timers — poll the sink, never
    // processAllAvailable (see StatefulTtlSpec)
    def rows = spark.table("early_timer_test")
      .filter($"k" === "a").select($"is_early", $"n", $"s").collect()
      .map(r => (r.getBoolean(0), r.getLong(1), r.getDouble(2))).toSeq
    def eventually(ms: Long = 30000)(cond: => Boolean): Unit = {
      val end = System.currentTimeMillis + ms
      while (!cond && System.currentTimeMillis < end) Thread.sleep(100)
      assert(cond, s"condition not met within ${ms}ms; rows=$rows")
    }

    mem.addData((ts("2024-01-01 00:05:00"), "a", 1.0)) // opens window (a, 00:00)
    eventually() { rows.contains((true, 1L, 1.0)) }    // timer-paced partial, n=1
    mem.addData((ts("2024-01-01 00:20:00"), "a", 2.0)) // same window, more data
    eventually() { rows.contains((true, 2L, 3.0)) }    // fresher partial, n=2
    // watermark past 01:00 (10 min lag) → next timer tick closes the window
    mem.addData((ts("2024-01-01 02:30:00"), "pad", 0.0))
    eventually() { rows.exists(!_._1) }
    val (early, fin) = rows.partition(_._1)
    assert(early.size >= 2, s"expected >=2 partial emissions, got: $rows")
    assert(fin === Seq((false, 2L, 3.0)))              // exactly one final, full aggregate

    // late data for the closed window must NOT resurrect state: without the
    // guard, ProcessingTimeTimeout does not filter watermark-late rows, the
    // state would be re-created from zero and a second (wrong, partial)
    // final row would follow
    mem.addData((ts("2024-01-01 00:40:00"), "a", 99.0)) // late: window closed
    Thread.sleep(2500) // give the timer clock >1 period to (wrongly) fire
    val after = rows
    assert(after.count(!_._1) === 1, s"duplicate final after late event: $after")
    assert(!after.contains((true, 1L, 99.0)), s"late event re-opened state: $after")
    job.stop()
  }

  test("busy key still gets wall-clock partials while data arrives every batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]

    val out = EarlyWindowOps.tumblingEarly[String, (Timestamp, String, Double),
        Long, (String, Boolean, Long)](
      mem.toDF.toDF("ts", "k", "v").withWatermark("ts", "10 minutes")
        .as[(Timestamp, String, Double)],
      tsFn = _._1, keyFn = _._2,
      windowMillis = 3600L * 1000, earlyPeriodMillis = 700,
      zero = 0L, acc = (a, _) => a + 1,
      export = (k, _, _, early, a) => (k, early, a))

    val job = out.toDF.toDF("k", "is_early", "n")
      .writeStream.format("memory").queryName("early_busy_test")
      .outputMode("append").start()

    def earlies = spark.table("early_busy_test")
      .filter($"k" === "b" && $"is_early").count()

    // feed the SAME key faster than the early period for ~6 s: the deadline
    // lives in state, so re-arming on each data batch must preserve it —
    // the buggy re-arm (full period per invocation) would emit ZERO partials
    // while data keeps arriving. No processAllAvailable here: with a
    // ProcessingTimeTimeout pending the engine runs continuous no-data
    // batches and that call can block (see the note in the previous test) —
    // the engine consumes on its own cadence while we keep feeding.
    val deadline = System.currentTimeMillis() + 6000
    var minute = 0
    while (System.currentTimeMillis() < deadline) {
      mem.addData((ts(f"2024-01-01 00:${minute % 50 + 1}%02d:00"), "b", 1.0))
      minute += 1
      Thread.sleep(150)
    }
    val seen = earlies // measured while data was still being fed
    assert(seen >= 2,
      s"only $seen wall-clock partials during 6s of continuous data (period=700ms)")
    job.stop()
  }
}
