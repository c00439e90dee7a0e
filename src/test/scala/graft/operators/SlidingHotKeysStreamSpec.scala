package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import graft.pipeline.StreamSinks
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The in-stream per-window argmax-with-ties ([[SlidingPanes
  * .slidingHotKeysStream]]) after the stage-3 rework: the tie set now comes
  * from a per-window MAX aggregation plus a window-equality join back
  * against the stage-2 counts — no operator ever buffers a window's full
  * candidate set in one aggregation row (the old `collect_list` shape was
  * the SURVEY §7.2 M6 unbounded-group risk at production key cardinality).
  * This spec pins the part the q158 oracle can't isolate: exact tie
  * emission, per closed window, from a hand-built stream.
  */
class SlidingHotKeysStreamSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("streaming hot keys emits ALL tied max keys per sliding window, on window close") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = SlidingPanes.slidingHotKeysStream(
      mem.toDF().toDF("k", "ts").withWatermark("ts", "1 second"),
      "ts", size = "10 minutes", slide = "5 minutes",
      key = col("k"), keyName = "k", nName = "n")
      .filter(col("k") =!= -1L)
    val job = StreamSinks.memory("hotkeys_ties", "append").start(out)
    try {
      // window [10:00,10:10) ∩ [10:05,10:15): keys 1 and 2 tie at 3, key 3 has 1
      val events = (Seq.fill(3)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L)).zipWithIndex
        .map { case (k, i) => (k, ts(6, i)) }
      mem.addData(events: _*)
      job.processAllAvailable()
      // sentinel far in the future advances the watermark past every window
      // the events touched; its own windows never close
      mem.addData((-1L, ts(59)))
      job.processAllAvailable()
      mem.addData((-1L, ts(59, 30)))
      job.processAllAvailable()

      val rows = spark.table("hotkeys_ties")
        .select(col("window_start").cast("string"), col("k"), col("n"))
        .as[(String, Long, Long)].collect().toSet
      val expected = Set(
        ("2024-01-01 10:00:00", 1L, 3L), ("2024-01-01 10:00:00", 2L, 3L),
        ("2024-01-01 10:05:00", 1L, 3L), ("2024-01-01 10:05:00", 2L, 3L))
      assert(rows === expected, s"got $rows")
    } finally job.cancel()
  }

  test("no ties: single hot key per window; counts spanning panes combine before the argmax") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val out = SlidingPanes.slidingHotKeysStream(
      mem.toDF().toDF("k", "ts").withWatermark("ts", "1 second"),
      "ts", size = "10 minutes", slide = "5 minutes",
      key = col("k"), keyName = "k", nName = "n")
      .filter(col("k") =!= -1L)
    val job = StreamSinks.memory("hotkeys_noties", "append").start(out)
    try {
      // key 7: 2 events in pane [10:00,10:05) + 2 in [10:05,10:10) — its
      // total of 4 in window [10:00,10:10) only wins once panes combine;
      // key 8 has 3 events all inside pane [10:05,10:10)
      mem.addData((7L, ts(1)), (7L, ts(2)), (7L, ts(6)), (7L, ts(7)),
        (8L, ts(5)), (8L, ts(6, 30)), (8L, ts(8)))
      job.processAllAvailable()
      mem.addData((-1L, ts(59)))
      job.processAllAvailable()
      mem.addData((-1L, ts(59, 30)))
      job.processAllAvailable()

      val rows = spark.table("hotkeys_noties")
        .select(col("window_start").cast("string"), col("k"), col("n"))
        .as[(String, Long, Long)].collect().toSet
      val expected = Set(
        // [09:55,10:05): key 7 has 2, key 8 has 0 (8's first event is 10:05)
        ("2024-01-01 09:55:00", 7L, 2L),
        // [10:00,10:10): 7 → 4 (2+2 across panes) beats 8 → 3
        ("2024-01-01 10:00:00", 7L, 4L),
        // [10:05,10:15): 7 → 2, 8 → 3 — 8 wins
        ("2024-01-01 10:05:00", 8L, 3L))
      assert(rows === expected, s"got $rows")
    } finally job.cancel()
  }
}
