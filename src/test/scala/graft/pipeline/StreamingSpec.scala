package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Structured-streaming parity tests: windows, sessions, stateful ops, merge,
  * stream-static join — mirroring the reference's WindowAggregateTest /
  * SessionWindowPTest / TransformStatefulPTest (SURVEY §5), with the
  * stream–batch equivalence oracle from FIXTURES.md §3.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregate over MemoryStream matches batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(
      (ts("2024-01-01 00:01:00"), "a", 1.0),
      (ts("2024-01-01 00:02:00"), "a", 2.0),
      (ts("2024-01-01 00:59:00"), "b", 3.0),
      (ts("2024-01-01 01:01:00"), "a", 4.0))
    val stage = new StreamSourceStage(mem.toDF.toDF("ts", "k", "v"))
      .withTimestamps("ts", "10 minutes")
    val agged = stage.groupingKey(col("k"))
      .window(WindowDefinition.tumbling("1 hour"))
      .aggregate(AggregateOperations.allOf(
        AggregateOperations.counting("n"),
        AggregateOperations.summingDouble(col("v"), "s")))
    val job = StreamSinks.memory("tumbling_test", "complete").start(agged)
    job.processAllAvailable()
    val rows = spark.table("tumbling_test")
      .select("k", "n", "s", "window_start").collect()
    val aHour0 = rows.find(r => r.getString(0) == "a" &&
      r.getTimestamp(3) == ts("2024-01-01 00:00:00")).get
    assert(aHour0.getLong(1) === 2 && aHour0.getDouble(2) === 3.0)
    job.cancel()
  }

  test("session window merges events within gap (SessionWindowP parity)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    mem.addData(
      (ts("2024-01-01 00:00:00"), "u1"),
      (ts("2024-01-01 00:10:00"), "u1"), // same session (gap 10m < 30m)
      (ts("2024-01-01 01:00:00"), "u1"), // new session (gap 50m)
      (ts("2024-01-01 00:05:00"), "u2"))
    val stage = new StreamSourceStage(mem.toDF.toDF("ts", "user"))
      .withTimestamps("ts", "1 minute")
    val agged = stage.groupingKey(col("user"))
      .window(WindowDefinition.session("30 minutes"))
      .aggregate(AggregateOperations.counting("n"))
    val job = StreamSinks.memory("session_test", "complete").start(agged)
    job.processAllAvailable()
    val u1Sessions = spark.table("session_test").filter($"user" === "u1")
      .select("n").collect().map(_.getLong(0)).sorted
    assert(u1Sessions.toSeq === Seq(1, 2))
    job.cancel()
  }

  test("mapStateful with rollingAggregate semantics (running sum per key)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    mem.addData(("a", 1L), ("a", 2L), ("b", 10L))
    val rolled = StatefulOps.rollingAggregate[String, (String, Long), Long, (String, Long)](
      mem.toDS(), _._1,
      zero = 0L,
      accumulate = (acc, v) => acc + v._2,
      export = (k, acc) => (k, acc))
    val job = StreamSinks.memory("rolling_test", "append").start(rolled.toDF())
    job.processAllAvailable()
    mem.addData(("a", 5L))
    job.processAllAvailable()
    val outs = spark.table("rolling_test").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // running sums per event: a→1, a→3, b→10, then a→8
    assert(outs.count(_._1 == "a") === 3)
    assert(outs.filter(_._1 == "a").map(_._2).max === 8L)
    assert(outs.filter(_._1 == "b").map(_._2).toSeq === Seq(10L))
    job.cancel()
  }

  test("merge of two streams + stream-static hashJoin enrichment") {
    implicit val sqlCtx = spark.sqlContext
    val m1 = MemoryStream[(Timestamp, Int)]
    val m2 = MemoryStream[(Timestamp, Int)]
    m1.addData((ts("2024-01-01 00:00:01"), 1))
    m2.addData((ts("2024-01-01 00:00:02"), 2))
    val dim = Seq((1, "one"), (2, "two")).toDF("id", "name")
    val s1 = new StreamSourceStage(m1.toDF.toDF("ts", "id")).withTimestamps("ts", "1 second")
    val s2 = new StreamSourceStage(m2.toDF.toDF("ts", "id")).withTimestamps("ts", "1 second")
    val dimR = dim.withColumnRenamed("id", "dim_id")
    val enriched = s1.merge(s2).hashJoin(dimR, col("id") === col("dim_id"))
    val job = StreamSinks.memory("merge_test", "append").start(enriched.df)
    job.processAllAvailable()
    val names = spark.table("merge_test").select("name").collect().map(_.getString(0)).sorted
    assert(names.toSeq === Seq("one", "two"))
    job.cancel()
  }

  test("hashJoinN enriches a stream against several dimensions (StreamHashJoinBuilder)") {
    implicit val sqlCtx = spark.sqlContext
    val m = MemoryStream[(Timestamp, Int)]
    m.addData((ts("2024-01-01 00:00:01"), 1), (ts("2024-01-01 00:00:02"), 2))
    val names = Seq((1, "one"), (2, "two")).toDF("name_id", "name")
    val colors = Seq((1, "red")).toDF("color_id", "color") // no row for 2 → NULL
    val enriched = new StreamSourceStage(m.toDF.toDF("ts", "id"))
      .withTimestamps("ts", "1 second")
      .hashJoinN(
        (names, col("id") === col("name_id")),
        (colors, col("id") === col("color_id")))
    val job = StreamSinks.memory("hashjoinn_test", "append").start(enriched.df)
    job.processAllAvailable()
    val rows = spark.table("hashjoinn_test")
      .select("id", "name", "color").collect()
      .map(r => (r.getInt(0), r.getString(1), Option(r.getString(2)))).sortBy(_._1)
    assert(rows.toSeq === Seq((1, "one", Some("red")), (2, "two", None)))
    job.cancel()
  }

  test("windowed co-aggregation of two keyed streams (aggregate2, one shuffle)") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val s0 = new StreamSourceStage(views.toDF.toDF("ts", "user"))
      .withTimestamps("ts", "1 minute")
      .groupingKey(col("user").as("u"))
      .window(WindowDefinition.Tumbling("1 minute"))
    val s1 = new StreamSourceStage(buys.toDF.toDF("bts", "buyer", "amount"))
      .withTimestamps("bts", "1 minute")
      .groupingKey(col("buyer").as("u"))
    val coagg = s0.aggregate2(
      AggregateOperations.counting("n_views"),
      s1,
      AggregateOperations.counting("n_buys")
        .and(AggregateOperations.summingDouble(col("amount"), "spend")))
    // complete mode: the memory table is replaced each batch, so the assert
    // reads final values rather than the per-batch update history
    val job = StreamSinks.memory("coagg_test", "complete").start(coagg)

    views.addData((ts("2024-01-01 00:00:01"), 1L), (ts("2024-01-01 00:00:02"), 1L),
      (ts("2024-01-01 00:00:03"), 2L))
    buys.addData((ts("2024-01-01 00:00:10"), 1L, 5.0))
    job.processAllAvailable()
    val rows = spark.table("coagg_test")
      .select("u", "n_views", "n_buys", "spend").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).sortBy(_._1)
    // user 1: both sides in the window; user 2: views only — outer semantics,
    // absent side counts 0 and sums null
    assert(rows.toSeq === Seq((1L, 2L, 1L, 5.0), (2L, 1L, 0L, -1.0)))
    job.cancel()
  }

  test("NON-KEYED windowed co-aggregation (Jet WindowAggregateBuilder): global window, two streams") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long)]
    val buys = MemoryStream[(Timestamp, Double)]
    // groupingKey() with no columns = Jet's StageWithWindow (window, no key):
    // the co-agg groups on the window alone, one result row per window
    val s0 = new StreamSourceStage(views.toDF.toDF("ts", "user"))
      .withTimestamps("ts", "1 minute")
      .groupingKey()
      .window(WindowDefinition.Tumbling("1 minute"))
    val s1 = new StreamSourceStage(buys.toDF.toDF("bts", "amount"))
      .withTimestamps("bts", "1 minute")
      .groupingKey()
    val coagg = s0.aggregate2(
      AggregateOperations.counting("n_views"),
      s1,
      AggregateOperations.summingDouble(col("amount"), "spend"))
    val job = StreamSinks.memory("global_coagg_test", "complete").start(coagg)
    views.addData((ts("2024-01-01 00:00:01"), 1L), (ts("2024-01-01 00:00:02"), 2L))
    buys.addData((ts("2024-01-01 00:00:10"), 5.0), (ts("2024-01-01 00:01:30"), 7.0))
    job.processAllAvailable()
    val rows = spark.table("global_coagg_test")
      .select("window_start", "n_views", "spend").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).sortBy(_._1)
    // first window has both sides; second window is buys-only (views count 0)
    assert(rows.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 2L, 5.0),
      ("2024-01-01 00:01:00.0", 0L, 7.0)))
    job.cancel()
  }

  test("three-way windowed co-aggregation (aggregate3 / WindowGroupAggregateBuilder)") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Timestamp, Long)]
    val b = MemoryStream[(Timestamp, Long)]
    val c = MemoryStream[(Timestamp, Long, Double)]
    def keyed(df: org.apache.spark.sql.DataFrame, tsName: String, keyCol: String) =
      new StreamSourceStage(df).withTimestamps(tsName, "1 minute")
        .groupingKey(col(keyCol).as("u"))
    val s0 = keyed(a.toDF.toDF("ts", "user"), "ts", "user")
      .window(WindowDefinition.Tumbling("1 minute"))
    val s1 = keyed(b.toDF.toDF("bts", "visitor"), "bts", "visitor")
    val s2 = keyed(c.toDF.toDF("cts", "payer", "amt"), "cts", "payer")
    val coagg = s0.aggregate3(
      AggregateOperations.counting("n_a"),
      s1, AggregateOperations.counting("n_b"),
      s2, AggregateOperations.summingDouble(col("amt"), "paid"))
    val job = StreamSinks.memory("coagg3_test", "complete").start(coagg)
    a.addData((ts("2024-01-01 00:00:01"), 7L))
    b.addData((ts("2024-01-01 00:00:02"), 7L), (ts("2024-01-01 00:00:03"), 7L))
    c.addData((ts("2024-01-01 00:00:04"), 7L, 2.5))
    job.processAllAvailable()
    val rows = spark.table("coagg3_test").select("u", "n_a", "n_b", "paid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq((7L, 1L, 2L, 2.5)))
    job.cancel()
  }

  test("stream-stream join with time-bounded condition (beyond-reference)") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val s1 = new StreamSourceStage(imps.toDF.toDF("imp_ts", "ad_id")).withTimestamps("imp_ts", "10 seconds")
    val s2 = new StreamSourceStage(clicks.toDF.toDF("click_ts", "click_ad")).withTimestamps("click_ts", "10 seconds")
    val joined = s1.joinStream(s2,
      col("ad_id") === col("click_ad") &&
        col("click_ts").between(col("imp_ts"), col("imp_ts") + expr("interval 1 minute")))
    val job = StreamSinks.memory("ssj_test", "append").start(joined.df)

    imps.addData((ts("2024-01-01 00:00:00"), 1L), (ts("2024-01-01 00:00:00"), 2L))
    clicks.addData((ts("2024-01-01 00:00:30"), 1L)) // within the minute -> match
    clicks.addData((ts("2024-01-01 00:05:00"), 2L)) // too late -> no match
    job.processAllAvailable()
    val matched = spark.table("ssj_test").select("ad_id").collect().map(_.getLong(0)).toSeq
    assert(matched === Seq(1L))
    job.cancel()
  }

  test("stream-batch equivalence: windowed counts on the events fixture") {
    implicit val sqlCtx = spark.sqlContext
    // replay the real fixture through a MemoryStream
    val events = Tables(spark, sf, "events")
      .select($"ts", $"event_type", $"value")
      .as[(Timestamp, String, Double)].collect().toSeq
    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(events)
    val stage = new StreamSourceStage(mem.toDF.toDF("ts", "event_type", "value"))
      .withTimestamps("ts", "1 hour")
    val agged = stage.groupingKey(col("event_type"))
      .window(WindowDefinition.tumbling("1 hour"))
      .aggregate(AggregateOperations.counting("n"))
    val job = StreamSinks.memory("equiv_test", "complete").start(agged)
    job.processAllAvailable()
    val streamed = spark.table("equiv_test")
      .select($"window_start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables(spark, sf, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start", $"event_type", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    job.cancel()
  }

  test("JobRegistry lifecycle: named jobs, SHOW JOBS, DROP JOB") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Int]
    mem.addData(1, 2, 3)
    val job = StreamSinks.memory("registry_probe", "append")
      .start(mem.toDF())
    assert(JobRegistry.list.exists { case (n, running) => n == "registry_probe" && running })
    assert(job.status === "RUNNING")
    job.processAllAvailable()
    // Jet Job.getMetrics parity: counters from the last progress event
    assert(job.metrics.getOrElse("numInputRows", -1.0) >= 0.0)
    assert(JobRegistry.drop("registry_probe"))
    assert(!JobRegistry.list.exists(_._1 == "registry_probe"))
    assert(!job.isRunning)
    assert(job.status === "COMPLETED")
  }
  test("aggregatePaned (chained pane path) matches the native sliding window aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = Seq(
      (ts("2024-01-01 00:01:00"), "a", 1.0),
      (ts("2024-01-01 00:07:00"), "a", 2.0),
      (ts("2024-01-01 00:13:00"), "b", 3.0),
      (ts("2024-01-01 00:21:00"), "a", 4.0),
      // far-future sentinel advances the watermark so append-mode panes and
      // windows all finalize
      (ts("2024-01-02 10:00:00"), "z", 0.0),
      (ts("2024-01-02 10:01:00"), "z", 0.0))
    mem.addData(events.take(4))
    val stage = new StreamSourceStage(mem.toDF.toDF("ts", "k", "v"))
      .withTimestamps("ts", "0 seconds")
    import graft.operators.SlidingPanes.PaneAgg
    val paned = stage.groupingKey(col("k"))
      .window(WindowDefinition.sliding("30 minutes", "10 minutes"))
      .aggregatePaned(Seq(
        PaneAgg(count(lit(1)), sum, "n"),
        PaneAgg(sum(col("v")), sum, "s")))
      .select(col("window_start"), col("k"), col("n"), col("s"))
    val job = StreamSinks.memory("paned_test", "append").start(paned)
    job.processAllAvailable()
    mem.addData(events.drop(4))
    job.processAllAvailable()
    mem.addData((ts("2024-01-02 10:02:00"), "z", 0.0))
    job.processAllAvailable()
    job.cancel()
    val got = spark.table("paned_test").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .filter(_._2 != "z").toSet
    // batch ground truth: the NATIVE sliding window over the same events
    val expected = spark.createDataset(events.filter(_._2 != "z"))(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.TIMESTAMP,
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaDouble))
      .toDF("ts", "k", "v")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "30 minutes", "10 minutes"), col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("window.start"), col("k"), col("n"), col("s"))
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected, s"paned=$got\nexpected=$expected")
  }
}
