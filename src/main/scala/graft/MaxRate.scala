package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Max-sustainable-rate probe — the engine-side analog of the reference's
  * single-node "events per second it can keep up with" methodology
  * (reference: site/website/blog/2021-03-17-billion-events-per-second.md:122-133 —
  * a node passes a rate if processing keeps up with the generators; the
  * published single-node ceiling is 25M events/s on 16 vCPUs).
  *
  * Instrument: Spark's rate source generates rows at a requested rows/second;
  * the pipeline is the same NEXMark-style keyed tumbling window count+sum the
  * BENCH throughput harness uses. A rate R is SUSTAINED if, over the probe
  * window (after a settle period), the query commits ≥95% of R rows/s —
  * under saturation committed-rows-per-wall-second IS engine throughput, so
  * a query that cannot keep up fails the criterion within one window.
  *
  * Search: geometric ladder (doubling) from 1M rows/s until a rate fails,
  * then one bisection step — prints one JSON line with the stateful and
  * stateless ceilings. Results are recorded in BASELINE.md, not gated: the
  * number is machine-relative (local[32] micro-batch vs the reference's
  * 45-node event-at-a-time cluster) and calibrates the architecture, not the
  * round artifact.
  */
object MaxRate {

  private val SettleSec = 4
  private val MeasureSec = 10

  /** Run the workload at `rate` rows/s; return measured processed rows/s if
    * sustained, else None.
    */
  private def probe(spark: SparkSession, rate: Long, stateful: Boolean): Option[Double] = {
    val shaped = RateWorkloads.shaped(spark, rate)
    val out =
      if (stateful) RateWorkloads.statefulAgg(shaped)
      else RateWorkloads.statelessMap(shaped)
    val q = out.writeStream.format("noop")
      .outputMode(if (stateful) "update" else "append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try {
      Thread.sleep(SettleSec * 1000L)
      // -1, not 0: if no batch completed during the settle (first batch slower
      // than SettleSec at high rates), batch 0's rows belong to the measured
      // window — excluding them undercounts and fails a sustainable rate
      val fromBatch = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      Thread.sleep(MeasureSec * 1000L)
      val progress = q.recentProgress.filter(_.batchId > fromBatch)
      if (progress.isEmpty) None
      else {
        val rows = progress.map(_.numInputRows).sum
        // when no batch closed inside the settle, the counted batches reach
        // back to stream START and include settle-time generation — divide by
        // the full elapsed span so catch-up backlog can never inflate the
        // verdict (it can only make it conservative)
        val span = if (fromBatch == -1L) (SettleSec + MeasureSec).toDouble
                   else MeasureSec.toDouble
        val processedPerSec = rows / span
        // sustained = kept up with ≥95% of the requested rate over the window
        if (processedPerSec >= 0.95 * rate) Some(processedPerSec) else None
      }
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-maxrate"),
      shufflePartitions = 8
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ceilingFor(stateful: Boolean): (Long, Double) = {
      val ceiling = 512000000L // generator guard: don't probe beyond this
      var rate = 1000000L
      var lastOk = 0L
      var lastMeasured = 0.0
      var sawFailure = false
      var done = false
      while (!done) {
        probe(spark, rate, stateful) match {
          case Some(m) => lastOk = rate; lastMeasured = m; rate *= 2
          case None => sawFailure = true; done = true
        }
        if (rate > ceiling) done = true
      }
      // one bisection step between last sustained and first FAILED rate —
      // only meaningful when the ladder actually failed (a guard-capped exit
      // has no failed rate above lastOk to bisect toward)
      if (lastOk > 0 && sawFailure) {
        val mid = lastOk + (lastOk / 2)
        probe(spark, mid, stateful).foreach { m => lastOk = mid; lastMeasured = m }
      }
      (lastOk, lastMeasured)
    }

    val (statelessRate, statelessMeasured) = ceilingFor(stateful = false)
    val (statefulRate, statefulMeasured) = ceilingFor(stateful = true)
    println(s"""{"metric":"max_sustainable_rate","unit":"rows_per_sec",""" +
      s""""stateless_rate":$statelessRate,"stateless_measured":$statelessMeasured,""" +
      s""""stateful_rate":$statefulRate,"stateful_measured":$statefulMeasured}""")
    spark.stop()
  }
}
