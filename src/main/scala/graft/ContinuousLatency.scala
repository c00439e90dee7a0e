package graft

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** END-TO-END per-event latency across Spark's three streaming execution
  * paths — probing the one axis where the reference is categorically ahead:
  * Jet publishes 26 ms p99 at 1 M events/s
  * (site/website/blog/2021-03-17-billion-events-per-second.md:42) from an
  * event-at-a-time engine, while a micro-batch engine's per-event floor is
  * trigger interval + batch execution (~300 ms in the replay gate).
  *
  * Two event-at-a-time paths exist on Spark 4.1:
  *
  *   - `Trigger.Continuous` (SPARK-20928): long-running tasks, per-epoch
  *     checkpoints; supports ONLY stateless map/filter/project — the
  *     NEXMark Q1/Q2 shape.
  *   - `Trigger.RealTime` (Spark 4.1 real-time mode): long-running per-batch
  *     tasks fed by `SupportsRealTimeRead.nextWithTimeout`; its operator
  *     allowlist adds BROADCAST HASH JOIN (+ explode/union/range) to the
  *     stateless set — so stream-static enrichment (the reference's
  *     `mapUsingIMap`/hash-join-enrich latency shape) runs event-at-a-time
  *     too. Measured here as `q3_enrich`.
  *
  * Method: a paced source stamps each event's emission time; a foreach sink
  * records (now − event ts) into a shared in-JVM histogram (local mode: the
  * writer threads share the driver JVM). After a settle period, ~30 s of
  * samples → p50/p95/p99/max per (shape, mode). The SAME pipeline + sink
  * measured under `Trigger.ProcessingTime(100ms)` is the honest micro-batch
  * comparison column — end-to-end event latency, not per-batch duration
  * (which `graft.Latency` reports).
  *
  * Output equivalence across modes is spec-pinned (ContinuousEquivalenceSpec
  * for continuous, RealTimeModeSpec for real-time): all modes run the same
  * pure column transform, so rows differ only in delivery timing, never
  * content.
  *
  * Env: SPARK_GRAFT_LATENCY_RATE (default 1 M rows/s — the reference's
  * latency-benchmark configuration), SPARK_GRAFT_CONT_SHAPES to filter
  * shapes, SPARK_GRAFT_CONT_MODES to filter modes.
  */
object ContinuousLatency {

  /** Shared latency histogram: 1 ms buckets to 20 s + saturation bucket.
    * Static because local-mode executor threads share the JVM — the same
    * trick the MaxRate/Latency instruments rely on for progress polling.
    */
  object Hist {
    private val Max = 20000
    val buckets = new java.util.concurrent.atomic.AtomicLongArray(Max + 1)
    @volatile var recordFrom: Long = Long.MaxValue
    def reset(settleMs: Long): Unit = {
      var i = 0
      while (i <= Max) { buckets.set(i, 0L); i += 1 }
      recordFrom = System.currentTimeMillis + settleMs
    }
    def record(latMs: Long): Unit =
      if (System.currentTimeMillis >= recordFrom) {
        val b = if (latMs < 0) 0 else math.min(latMs, Max.toLong).toInt
        buckets.incrementAndGet(b)
      }
    def count: Long = {
      var (i, n) = (0, 0L)
      while (i <= Max) { n += buckets.get(i); i += 1 }
      n
    }
    def percentile(p: Double): Int = {
      val total = count
      if (total == 0) return -1
      val target = math.ceil(p * total).toLong
      var (i, seen) = (0, 0L)
      while (i <= Max) {
        seen += buckets.get(i)
        if (seen >= target) return i
        i += 1
      }
      Max
    }
  }

  /** Foreach sink recording end-to-end latency of the `ts` column. */
  private final class LatWriter(tsIdx: Int) extends ForeachWriter[Row] {
    override def open(partitionId: Long, epochId: Long): Boolean = true
    override def process(r: Row): Unit =
      Hist.record(System.currentTimeMillis - r.getTimestamp(tsIdx).getTime)
    override def close(errorOrNull: Throwable): Unit = ()
  }

  /** NEXMark Q1 (currency map), Q2 (selection), and Q3-style stream-static
    * enrichment (broadcast hash join against a 10k-row auctions dim) — the
    * shapes the event-at-a-time paths support; ts kept for the sink. The
    * full pipeline processes EVERY row; a 1-in-`Sample` in-query filter then
    * thins what reaches the foreach sink, so the measurement never pays the
    * sink's per-row Row materialization at the full rate (the r9 first run
    * showed that overhead dominating the micro-batch column at 1 M rows/s).
    * Sampling on `value` is uniform in time, so percentiles are unbiased.
    *
    * Source: the event-at-a-time modes use [[graft.streaming.PacedRateSource]]
    * (emission-stamped, properly paced — see its scaladoc for why the
    * built-in rate source cannot measure this); micro-batch uses the
    * built-in rate source, whose pacing and per-row timestamps are correct
    * in that mode.
    */
  private val Sample = 97L

  def shape(spark: SparkSession, name: String, rate: Long,
            paced: Boolean): DataFrame = {
    val parts = sys.env.getOrElse("SPARK_GRAFT_CONT_PARTS", "8")
    val raw =
      if (paced) spark.readStream.format("graft.streaming.PacedRateSource")
        .option("rowsPerSecond", rate.toString)
        .option("numPartitions", parts).load()
      else spark.readStream.format("rate")
        .option("rowsPerSecond", rate.toString)
        .option("numPartitions", parts).load()
    val src = raw.select(col("timestamp").as("ts"), col("value"),
      (col("value") % 10000).as("auction"),
      (col("value") % 1000 * 100 + 100).as("price"))
    val out = name match {
      case "q1_map" =>
        src.select(col("ts"), col("value"), col("auction"),
          (col("price").cast("double") * 0.89).as("price_eur"))
      case "q2_filter" =>
        src.filter(col("auction") % 123 === 0)
          .select(col("ts"), col("value"), col("auction"), col("price"))
      case "q3_enrich" =>
        // stream-static enrichment: Jet's mapUsingIMap / hashJoin shape.
        // spark.range is RangeExec and the join plans as
        // BroadcastHashJoin — both on the real-time allowlist.
        val dim = spark.range(10000).select(col("id").as("auction"),
          (col("id") % 50).as("category"),
          concat(lit("seller_"), col("id") % 1000).as("seller"))
        src.join(broadcast(dim), "auction")
          .select(col("ts"), col("value"), col("auction"), col("category"),
            col("seller"), col("price"))
      case "q4_service" =>
        // the SERVICE-TRANSFORM path (Jet mapUsingService): our actual
        // StreamStage operator — DeserializeToObject → MapPartitions →
        // SerializeFromObject, supported by BOTH event-at-a-time modes.
        // The service is a 10k-entry in-process dictionary (the local-cache
        // analog of mapUsingIMap enrichment).
        val dict: Map[Long, Long] = (0L until 10000L).map(k => k -> k % 50).toMap
        val factory = pipeline.ServiceFactory(() => dict)
        val outSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("auction",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("category",
            org.apache.spark.sql.types.LongType)))
        new pipeline.StreamStage(
          src.select(col("ts"), col("value"), col("auction")), "ts")
          .mapUsingService(factory, outSchema) { (svc, r) =>
            Row(r.getTimestamp(0), r.getLong(1), r.getLong(2),
              svc(r.getLong(2)): java.lang.Long)
          }.df
      case "q5_ann" =>
        // per-event VECTOR SEARCH (the q161 serving shape): each event's
        // pseudo-query vector scans an N×64 in-service index
        // (SPARK_GRAFT_ANN_INDEX, default 1024) for its best-dot neighbor —
        // 64·N multiply-adds per event, all row-local. Measures what
        // BRUTE-FORCE ANN serving costs on the event-at-a-time paths; the
        // cost is linear in the index, which is q161's flagged scale shape.
        val dims = 64
        val nVecs = sys.env.getOrElse("SPARK_GRAFT_ANN_INDEX", "1024").toInt
        def fill(seed: Long, v: Array[Float]): Unit = {
          var x = seed * 2654435761L + 12345L
          var d = 0
          while (d < dims) {
            x = x * 6364136223846793005L + 1442695040888963407L
            v(d) = ((x >>> 40) % 1000L) / 1000.0f
            d += 1
          }
        }
        val factory = pipeline.ServiceFactory(() =>
          Array.tabulate(nVecs) { i =>
            val v = new Array[Float](dims); fill(i.toLong, v); v
          })
        val outSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("best",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType)))
        new pipeline.StreamStage(src.select(col("ts"), col("value")), "ts")
          .mapUsingService(factory, outSchema) { (idx, r) =>
            val value = r.getLong(1)
            val q = new Array[Float](dims)
            fill(value, q)
            var best = -1L
            var bs = Double.MinValue
            var i = 0
            while (i < idx.length) {
              val v = idx(i)
              var d = 0.0
              var t = 0
              while (t < dims) { d += q(t).toDouble * v(t).toDouble; t += 1 }
              if (d > bs) { bs = d; best = i.toLong }
              i += 1
            }
            Row(r.getTimestamp(0), value, best, bs)
          }.df
      case "q6_ivf" =>
        // per-event IVF-PROBED vector search (the q162 serving shape): same
        // index as q5_ann (SPARK_GRAFT_ANN_INDEX vectors) but pre-bucketed
        // into ~√N cells (sign bits of the leading b dims, 4^b ≥ N — the
        // same integer cell rule as q162); each event scores the √N
        // centroids, probes its 2 nearest cells, and scans only those
        // posting lists — O(√N) per event vs q5_ann's O(N). The ceiling
        // ratio between the two shapes AT THE SAME INDEX SIZE is the
        // measured case for the IVF composition being the production plan.
        val dims = 64
        val nVecs = sys.env.getOrElse("SPARK_GRAFT_ANN_INDEX", "1024").toInt
        def fill(seed: Long, v: Array[Float]): Unit = {
          var x = seed * 2654435761L + 12345L
          var d = 0
          while (d < dims) {
            x = x * 6364136223846793005L + 1442695040888963407L
            v(d) = ((x >>> 40) % 1000L) / 1000.0f - 0.5f
            d += 1
          }
        }
        var b = 0
        while ((1L << (2 * b)) < nVecs) b += 1
        val nCells = 1 << b
        final case class IvfIdx(cents: Array[Array[Double]],
                                cells: Array[Array[Array[Float]]],
                                ids: Array[Array[Long]])
        val factory = pipeline.ServiceFactory(() => {
          val vecs = Array.tabulate(nVecs) { i =>
            val v = new Array[Float](dims); fill(i.toLong, v); v
          }
          def cellOf(v: Array[Float]): Int = {
            var bits = 0; var j = 0
            while (j < b) { if (v(j) >= 0f) bits |= 1 << j; j += 1 }
            bits
          }
          val grouped = Array.fill(nCells)(
            new scala.collection.mutable.ArrayBuffer[Int])
          vecs.zipWithIndex.foreach { case (v, i) => grouped(cellOf(v)) += i }
          val cents = grouped.map { members =>
            val m = new Array[Double](dims)
            if (members.nonEmpty) {
              members.foreach { i =>
                val v = vecs(i); var d = 0
                while (d < dims) { m(d) += v(d).toDouble; d += 1 }
              }
              var d = 0
              while (d < dims) { m(d) /= members.length; d += 1 }
            }
            m
          }
          IvfIdx(cents,
            grouped.map(ms => ms.map(vecs).toArray),
            grouped.map(ms => ms.map(_.toLong).toArray))
        })
        val outSchema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("best",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType)))
        new pipeline.StreamStage(src.select(col("ts"), col("value")), "ts")
          .mapUsingService(factory, outSchema) { (idx, r) =>
            val value = r.getLong(1)
            val q = new Array[Float](dims)
            fill(value, q)
            def dotF(v: Array[Float]): Double = {
              var d = 0.0; var t = 0
              while (t < dims) { d += q(t).toDouble * v(t).toDouble; t += 1 }
              d
            }
            // probe: 2 best centroids by dot
            var (c1, s1, c2, s2) = (-1, Double.MinValue, -1, Double.MinValue)
            var ci = 0
            while (ci < idx.cents.length) {
              val c = idx.cents(ci)
              var d = 0.0; var t = 0
              while (t < dims) { d += q(t).toDouble * c(t); t += 1 }
              if (d > s1) { c2 = c1; s2 = s1; c1 = ci; s1 = d }
              else if (d > s2) { c2 = ci; s2 = d }
              ci += 1
            }
            var best = -1L
            var bs = Double.MinValue
            Seq(c1, c2).foreach { c =>
              if (c >= 0) {
                val cell = idx.cells(c)
                var i = 0
                while (i < cell.length) {
                  val d = dotF(cell(i))
                  if (d > bs) { bs = d; best = idx.ids(c)(i) }
                  i += 1
                }
              }
            }
            Row(r.getTimestamp(0), value, best, bs)
          }.df
      case other => sys.error(s"unknown shape '$other'")
    }
    out.filter(pmod(col("value"), lit(Sample)) === 0)
  }

  def main(args: Array[String]): Unit = {
    val rate = sys.env.getOrElse("SPARK_GRAFT_LATENCY_RATE", "1000000").toLong
    val shapes = sys.env.getOrElse("SPARK_GRAFT_CONT_SHAPES",
      "q1_map,q2_filter,q3_enrich").split(',').filter(_.nonEmpty).toSeq
    val modeFilter = sys.env.get("SPARK_GRAFT_CONT_MODES").map(_.split(',').toSet)
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("graft-cont-latency"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val modes = Seq(
      "continuous" -> Trigger.Continuous("1 second"),
      "realtime" -> Trigger.RealTime("5 seconds"),
      "microbatch_100ms" -> Trigger.ProcessingTime("100 milliseconds"))

    def supported(sh: String, mode: String): Boolean =
      mode != "continuous" || sh != "q3_enrich" // continuous mode: no joins

    val results = for {
      sh <- shapes
      (modeName, trigger) <- modes
      if supported(sh, modeName) && modeFilter.forall(_.contains(modeName))
    } yield {
      val ckpt = java.nio.file.Files.createTempDirectory("graft_contlat_").toString
      val df = shape(spark, sh, rate, paced = modeName != "microbatch_100ms")
      Hist.reset(settleMs = 8000)
      // real-time mode requires Update output mode (Append rejected in 4.1);
      // for these stateless shapes the two modes emit identical rows
      val q = df.writeStream
        .outputMode(if (modeName == "realtime") "update" else "append")
        .foreach(new LatWriter(0))
        .option("checkpointLocation", ckpt)
        .trigger(trigger).start()
      Thread.sleep(8000 + 30000)
      q.stop()
      pipeline.TempFiles.deleteTree(ckpt)
      val (p50, p95, p99, mx) = (Hist.percentile(0.50), Hist.percentile(0.95),
        Hist.percentile(0.99), Hist.percentile(1.0))
      val n = Hist.count
      System.err.println(s"[contlat] $sh/$modeName n=$n p50=$p50 p95=$p95 p99=$p99 max=$mx")
      s""""${sh}_$modeName":{"n":$n,"p50":$p50,"p95":$p95,"p99":$p99,"max":$mx}"""
    }
    println(s"""{"metric":"event_latency_ms","rate_rows_per_sec":$rate,""" +
      s""""sampled_1_in":$Sample,""" + results.mkString(",") + "}")
    spark.stop()
  }
}
