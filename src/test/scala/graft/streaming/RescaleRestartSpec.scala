package graft.streaming

import graft.SparkSpec
import graft.pipeline.{StatefulOps, StreamSinks}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Rescale/elasticity (SURVEY §2.15; VERDICT r10 item 6). The reference
  * rescales a job by suspend → snapshot → resume at the member set's new
  * parallelism (JobConfig autoScaling, JobRestartWithSnapshotTest). The
  * Spark analog has two independent axes, pinned here honestly:
  *
  *  - EXECUTOR parallelism rescales freely: state stores are files in the
  *    checkpoint, so a restart with more/fewer executors redistributes the
  *    same state partitions across them (nothing to test single-JVM — it is
  *    the deployment default).
  *  - The STATE PARTITION COUNT is pinned at the query's first start:
  *    Spark records `spark.sql.shuffle.partitions` in the checkpoint's
  *    offset-log metadata and REPLAYS it on restart, ignoring the new
  *    session conf for stateful operators. A restart under a different
  *    conf therefore resumes with intact state at the ORIGINAL width
  *    instead of corrupting or resetting state — the safe half of Jet's
  *    rescaling; an actual width change needs an offline state rewrite
  *    (Spark's documented state-repartitioning limitation).
  */
class RescaleRestartSpec extends SparkSpec {

  import spark.implicits._

  test("restart under a changed shuffle-partition conf: state intact, width pinned from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_rescale_").toString
    val (out, ckpt) = (s"$dir/out", s"$dir/checkpoint")
    val mem = MemoryStream[(String, Long)]
    def runningSum() =
      StatefulOps.rollingAggregate[String, (String, Long), Long, (String, Long)](
        mem.toDS(), _._1, zero = 0L,
        accumulate = (acc, v) => acc + v._2,
        export = (k, acc) => (k, acc)).toDF("k", "running")

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // incarnation 1 at parallelism 2
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      mem.addData(("a", 1L), ("b", 10L))
      val job1 = StreamSinks.files(out, ckpt).start(runningSum())
      job1.processAllAvailable()
      val width1 = job1.query.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .head.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        .numShufflePartitions
      assert(width1 === 2L, s"run 1 must run its state at width 2, got $width1")
      job1.cancel()

      // "rescale": the operator restarts under a DIFFERENT parallelism conf
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      mem.addData(("a", 2L), ("b", 5L))
      val job2 = StreamSinks.files(out, ckpt).start(runningSum())
      job2.processAllAvailable()
      val width2 = job2.query.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .head.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        .numShufflePartitions
      job2.cancel()

      // state INTACT across the restart: a = 1 → 3, b = 10 → 15
      val rows = spark.read.parquet(out).as[(String, Long)].collect().toSeq
      assert(rows.filter(_._1 == "a").map(_._2).sorted === Seq(1L, 3L),
        s"state must continue across the rescale restart: $rows")
      assert(rows.filter(_._1 == "b").map(_._2).sorted === Seq(10L, 15L))
      // width PINNED from the checkpoint, not the new conf — the safe
      // behavior this spec exists to document
      assert(width2 === 2L,
        s"state width must replay from checkpoint metadata (2), got $width2")
      // and the pin is visible in the checkpoint's offset-log metadata
      val offsetFiles = new java.io.File(s"$ckpt/offsets").listFiles()
      val metadata = offsetFiles.map(f =>
        new String(java.nio.file.Files.readAllBytes(f.toPath))).mkString
      assert(metadata.contains("\"spark.sql.shuffle.partitions\":\"2\""),
        "offset-log metadata must record the pinned width")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def stateWidth(job: graft.pipeline.JobHandle): Long =
    job.query.lastProgress.stateOperators.asInstanceOf[Array[_]]
      .head.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
      .numShufflePartitions

  test("offline rewrite: fMGWS state survives a width change (2 -> 5) with exact values") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_rescale_rw_").toString
    val (out, ckpt, ckpt2) = (s"$dir/out", s"$dir/ckpt", s"$dir/ckpt2")
    val mem = MemoryStream[(String, Long)]
    def runningSum() =
      StatefulOps.rollingAggregate[String, (String, Long), Long, (String, Long)](
        mem.toDS(), _._1, zero = 0L,
        accumulate = (acc, v) => acc + v._2,
        export = (k, acc) => (k, acc)).toDF("k", "running")

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // incarnation 1 at width 2: 40 keys so every new partition gets state
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      mem.addData((1 to 40).map(i => (s"k$i", i.toLong)))
      val job1 = StreamSinks.files(out, ckpt).start(runningSum())
      job1.processAllAvailable()
      assert(stateWidth(job1) === 2L)
      job1.cancel()

      // the offline rewrite: 2 -> 5
      assert(StateRescale.recordedWidth(ckpt) === 2)
      StateRescale.rewrite(spark, ckpt, ckpt2, newWidth = 5)
      assert(StateRescale.recordedWidth(ckpt2) === 5)

      // incarnation 2 RESUMES from the rewritten checkpoint at width 5
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      mem.addData((1 to 40).map(i => (s"k$i", 100L)))
      val job2 = StreamSinks.files(out, ckpt2).start(runningSum())
      job2.processAllAvailable()
      val w2 = stateWidth(job2)
      job2.cancel()
      assert(w2 === 5L, s"rewritten checkpoint must run state at width 5, got $w2")

      // every key's state continued exactly: i then i+100
      val rows = spark.read.parquet(out).as[(String, Long)].collect().toSeq
      val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      for (i <- 1 to 40)
        assert(byKey(s"k$i") === Seq(i.toLong, i + 100L),
          s"k$i state must continue across the width rewrite: ${byKey(s"k$i")}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("offline rewrite: complete-mode aggregation state survives a width change (3 -> 7)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_rescale_cagg_").toString
    val (ckpt, ckpt2) = (s"$dir/ckpt", s"$dir/ckpt2")
    val mem = MemoryStream[(String, Long)]
    def agged() = mem.toDF().toDF("k", "v").groupBy($"k")
      .agg(sum($"v").as("total"), count(lit(1)).as("cnt"))
    val name1 = "rescale_cagg_1"
    val name2 = "rescale_cagg_2"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      mem.addData((1 to 20).map(i => (s"k$i", i.toLong)))
      val q1 = agged().writeStream.format("memory").queryName(name1)
        .outputMode("complete").option("checkpointLocation", ckpt).start()
      q1.processAllAvailable()
      q1.stop()

      StateRescale.rewrite(spark, ckpt, ckpt2, newWidth = 7)

      spark.conf.set("spark.sql.shuffle.partitions", "7")
      mem.addData((1 to 20).map(i => (s"k$i", 1000L)))
      val q2 = agged().writeStream.format("memory").queryName(name2)
        .outputMode("complete").option("checkpointLocation", ckpt2).start()
      q2.processAllAvailable()
      val width = q2.lastProgress.stateOperators.head.numShufflePartitions
      q2.stop()
      assert(width === 7L, s"rewritten agg must run at width 7, got $width")
      val rows = spark.table(name2).as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(rows.size === 20)
      for ((k, total, cnt) <- rows) {
        val i = k.stripPrefix("k").toInt
        assert((total, cnt) === (i + 1000L, 2L),
          s"$k total must span the rewrite: got ($total, $cnt)")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("offline rewrite: stream-stream join state survives a width change (2 -> 5)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_rescale_join_").toString
    val (out, ckpt, ckpt2) = (s"$dir/out", s"$dir/ckpt", s"$dir/ckpt2")
    val l = MemoryStream[(Int, String)]
    val r = MemoryStream[(Int, String)]
    def joined() = {
      val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:01")
      val lf = l.toDF().toDF("k", "lv")
        .withColumn("lts", lit(ts)).withWatermark("lts", "1 minute")
      val rf = r.toDF().toDF("k2", "rv")
        .withColumn("rts", lit(ts)).withWatermark("rts", "1 minute")
      lf.join(rf, expr("k = k2")).select($"k", $"lv", $"rv")
    }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      // incarnation 1 buffers 20 unmatched left rows in join state
      l.addData((1 to 20).map(i => (i, s"L$i")))
      val job1 = StreamSinks.files(out, ckpt).start(joined())
      job1.processAllAvailable()
      job1.cancel()
      assert(spark.read.parquet(out).count() == 0, "nothing matched yet")

      StateRescale.rewrite(spark, ckpt, ckpt2, newWidth = 5)

      // incarnation 2 at width 5: the right rows must find the REWRITTEN
      // buffered left state — a mis-routed key would silently produce no match
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      r.addData((1 to 20).map(i => (i, s"R$i")))
      val job2 = StreamSinks.files(out, ckpt2).start(joined())
      job2.processAllAvailable()
      val width = job2.query.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .head.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        .numShufflePartitions
      job2.cancel()
      assert(width === 5L, s"join must run at the rewritten width, got $width")
      val rows = spark.read.parquet(out)
        .as[(Int, String, String)].collect().toSeq.sortBy(_._1)
      assert(rows.size === 20, s"every buffered left row must match: ${rows.size}")
      assert(rows === (1 to 20).map(i => (i, s"L$i", s"R$i")))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("offline rewrite: session-window state (prefix-scan keys) survives a width change (2 -> 5)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_rescale_sess_").toString
    val (out, ckpt, ckpt2) = (s"$dir/out", s"$dir/ckpt", s"$dir/ckpt2")
    val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
    def sessions() =
      mem.toDF().toDF("ts", "k", "v")
        .withWatermark("ts", "0 seconds")
        .groupBy(session_window($"ts", "30 seconds").as("w"), $"k")
        .agg(sum($"v").as("total"), count(lit(1)).as("cnt"))
        .select($"k", $"total", $"cnt")
    def ts(sec: Int) = java.sql.Timestamp.valueOf(s"2026-01-01 00:00:${"%02d".format(sec)}")

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      // open sessions for 12 keys
      mem.addData((1 to 12).map(i => (ts(1), s"k$i", i.toLong)))
      val job1 = StreamSinks.files(out, ckpt).start(sessions())
      job1.processAllAvailable()
      job1.cancel()

      StateRescale.rewrite(spark, ckpt, ckpt2, newWidth = 5)

      spark.conf.set("spark.sql.shuffle.partitions", "5")
      // extend the SAME sessions, then close them
      mem.addData((1 to 12).map(i => (ts(20), s"k$i", 100L)))
      val job2 = StreamSinks.files(out, ckpt2).start(sessions())
      job2.processAllAvailable()
      mem.addData(Seq((ts(59), "flush", 0L)))
      job2.query.processAllAvailable()
      val width = job2.query.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .head.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
        .numShufflePartitions
      job2.cancel()
      assert(width === 5L, s"session agg must run at the rewritten width, got $width")

      val rows = spark.read.parquet(out)
        .select($"k", $"total", $"cnt").as[(String, Long, Long)].collect()
        .filter(_._1 != "flush").toSeq.sortBy(_._1.stripPrefix("k").toInt)
      assert(rows.size === 12, s"all 12 sessions must close once: $rows")
      for ((k, total, cnt) <- rows) {
        val i = k.stripPrefix("k").toInt
        assert((total, cnt) === (i + 100L, 2L),
          s"$k session must merge pre- and post-rewrite events: ($total, $cnt)")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("offline rewrite: windowed aggregation state survives a width change (3 -> 7)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_rescale_agg_").toString
    val (out, ckpt, ckpt2) = (s"$dir/out", s"$dir/ckpt", s"$dir/ckpt2")
    val mem = MemoryStream[(java.sql.Timestamp, String, Long)]
    def windowed() =
      mem.toDF().toDF("ts", "k", "v")
        .withWatermark("ts", "0 seconds")
        .groupBy(window($"ts", "10 seconds"), $"k")
        .agg(sum($"v").as("total"), count(lit(1)).as("cnt"))
        .select($"window.start".as("ws"), $"k", $"total", $"cnt")
    def ts(sec: Int) = java.sql.Timestamp.valueOf(s"2026-01-01 00:00:${"%02d".format(sec)}")

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      // open window [0,10) with partial sums for 20 keys
      mem.addData((1 to 20).map(i => (ts(1), s"k$i", i.toLong)))
      val job1 = StreamSinks.files(out, ckpt).start(windowed())
      job1.processAllAvailable()
      job1.cancel()

      StateRescale.rewrite(spark, ckpt, ckpt2, newWidth = 7)

      spark.conf.set("spark.sql.shuffle.partitions", "7")
      // more rows into the SAME window, then advance watermark to close it
      mem.addData((1 to 20).map(i => (ts(5), s"k$i", 1000L)))
      val job2 = StreamSinks.files(out, ckpt2).start(windowed())
      job2.processAllAvailable()
      mem.addData(Seq((ts(30), "flush", 0L)))
      job2.query.processAllAvailable()
      val w2 = stateWidth(job2)
      job2.cancel()
      assert(w2 === 7L, s"windowed agg must run at the rewritten width, got $w2")

      // the closed window's totals must merge pre- and post-rewrite rows
      val rows = spark.read.parquet(out)
        .select($"k", $"total", $"cnt").as[(String, Long, Long)].collect()
        .filter(_._1 != "flush").toSeq.sortBy(_._1)
      assert(rows.size === 20, s"all 20 keys must close: $rows")
      for ((k, total, cnt) <- rows) {
        val i = k.stripPrefix("k").toInt
        assert((total, cnt) === (i + 1000L, 2L),
          s"$k window total must span the rewrite: got ($total, $cnt)")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
