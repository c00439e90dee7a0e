package graft

import java.util.concurrent.atomic.{AtomicLong, LongAdder}
import java.util.concurrent.locks.LockSupport

import org.apache.spark.sql.{ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** SINK-STALL behavior probe for the streaming execution paths (VERDICT r9
  * item 6): what happens when the sink cannot keep up — does the source pace
  * down, does work buffer, or does the query fail? The reference's answer is
  * adaptive receive windows (`ReceiverTasklet.java:66+`: senders shrink
  * their in-flight window as the receiver's queue fills, so backpressure
  * propagates to the source). Spark's event-at-a-time paths are PULL-based
  * (the sink's thread drives the reader), so the prediction is: the paced
  * source under-delivers (pacing down), per-row sink latency stays flat,
  * and the queue is the un-emitted remainder at the source — no unbounded
  * buffering, no failure. The plain micro-batch path admits offsets on the
  * wall clock regardless of execution speed, so its backlog GROWS: batches
  * get bigger, end-to-end lag climbs without bound until the operator
  * intervenes (maxOffsetsPerTrigger-style knobs are the mitigation).
  *
  * Method: PacedRateSource at `SPARK_GRAFT_STALL_RATE` rows/s (default
  * 100k) into a foreach sink that parks `SPARK_GRAFT_STALL_MICROS` (default
  * 100 µs) per row — sink capacity = parts · 1e6/stallMicros rows/s, set
  * below the configured rate so the sink is the bottleneck. After
  * `SPARK_GRAFT_STALL_SECS` (default 25 s): delivered rows/s, the source
  * HIGH-WATER LAG (configured-schedule rows minus the highest value
  * actually emitted, in seconds at the configured rate — the queueing the
  * per-row sink latency cannot see, because rows are stamped at emission),
  * per-row sink-side percentiles, and whether the query died.
  *
  * Results → BASELINE.md r10 stall table.
  */
object StallProbe {

  private val processed = new LongAdder
  private val maxValue = new AtomicLong(-1L)

  private final class StallingWriter(stallNanos: Long) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(r: Row): Unit = {
      LockSupport.parkNanos(stallNanos)
      processed.increment()
      ContinuousLatency.Hist.record(
        System.currentTimeMillis - r.getTimestamp(0).getTime)
      val v = r.getLong(1)
      var cur = maxValue.get()
      while (v > cur && !maxValue.compareAndSet(cur, v)) cur = maxValue.get()
    }
    override def close(errorOrNull: Throwable): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    val rate = sys.env.getOrElse("SPARK_GRAFT_STALL_RATE", "100000").toLong
    val stallMicros = sys.env.getOrElse("SPARK_GRAFT_STALL_MICROS", "100").toLong
    val secs = sys.env.getOrElse("SPARK_GRAFT_STALL_SECS", "25").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_CONT_PARTS", "4").toInt
    val modeFilter = sys.env.get("SPARK_GRAFT_CONT_MODES").map(_.split(',').toSet)
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("graft-stall-probe"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val capacity = parts * (1000000L / math.max(1L, stallMicros))
    val modes = Seq(
      "continuous" -> Trigger.Continuous("5 seconds"),
      "realtime" -> Trigger.RealTime("5 seconds"),
      "microbatch_100ms" -> Trigger.ProcessingTime("100 milliseconds"))

    val results = modes.collect {
      case (modeName, trigger) if modeFilter.forall(_.contains(modeName)) =>
        val ckpt = java.nio.file.Files.createTempDirectory("graft_stall_").toString
        processed.reset()
        maxValue.set(-1L)
        ContinuousLatency.Hist.reset(settleMs = 0)
        val df = spark.readStream.format("graft.streaming.PacedRateSource")
          .option("rowsPerSecond", rate.toString)
          .option("numPartitions", parts.toString).load()
          .select(col("timestamp").as("ts"), col("value"))
        val t0 = System.currentTimeMillis
        val q = df.writeStream
          .outputMode(if (modeName == "realtime") "update" else "append")
          .foreach(new StallingWriter(stallMicros * 1000L))
          .option("checkpointLocation", ckpt)
          .trigger(trigger).start()
        Thread.sleep(secs * 1000L)
        val failed = q.exception.isDefined
        val elapsedS = (System.currentTimeMillis - t0) / 1000.0
        val n = processed.sum()
        val deliveredPerS = n / elapsedS
        // scheduled rows by now vs highest value actually EMITTED — the
        // queue the emission-stamped sink latency cannot see
        val scheduled = (elapsedS * rate).toLong
        val hw = maxValue.get() + 1
        val lagS = math.max(0L, scheduled - hw) / rate.toDouble
        try q.stop() catch { case _: Throwable => () }
        pipeline.TempFiles.deleteTree(ckpt)
        val (p50, p99, mx) = (ContinuousLatency.Hist.percentile(0.50),
          ContinuousLatency.Hist.percentile(0.99),
          ContinuousLatency.Hist.percentile(1.0))
        System.err.println(f"[stall] $modeName delivered=$deliveredPerS%.0f/s " +
          f"of $rate (capacity≈$capacity) hwLag=$lagS%.1fs p50=$p50 p99=$p99 " +
          s"max=$mx failed=$failed")
        s""""$modeName":{"delivered_per_s":${deliveredPerS.toLong},""" +
          s""""hw_lag_s":$lagS,"p50":$p50,"p99":$p99,"max":$mx,""" +
          s""""failed":$failed}"""
    }
    println(s"""{"metric":"sink_stall_behavior","rate_rows_per_sec":$rate,""" +
      s""""sink_capacity_rows_per_sec":$capacity,"stall_micros":$stallMicros,""" +
      results.mkString(",") + "}")
    spark.stop()
  }
}
