package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-store provider A/B at two state cardinalities — the measurement
  * behind GraftSession.rocksdbStateStore's guidance ("switch to RocksDB when
  * keyed state outgrows the heap"). BASELINE.md's round-4 A/B showed a tie at
  * the BENCH workload's few-hundred-key state; this main repeats the identical
  * replay at 2M distinct keys, where the HDFS-backed provider must serialize
  * the full state snapshot per commit while RocksDB + changelog checkpointing
  * appends only the batch's delta.
  *
  * Workload: N rows pre-written as parquet (once per cardinality, shared by
  * both provider runs), replayed through a file stream in ~10 micro-batches
  * into a keyed tumbling-window count+sum (same shape as
  * Bench.streamThroughput), noop sink, update mode. Reported rate is
  * rows / wall-seconds for the whole replay; state rows from the final
  * progress event confirm the cardinality actually materialized.
  */
object StateScale {

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("graft-statescale"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // explicit flatMap, not a mid-binding for-comprehension: the input for a
    // cardinality is written right before its pair of runs and removed right
    // after (a `input = ...` binding would eagerly write BOTH 4M-row inputs
    // before the first measurement — double the temp disk and a polluted
    // page cache under the "cold" first run)
    val results = Seq(200L, 2000000L).flatMap { cardinality =>
      val input = writeInput(spark, cardinality)
      try Seq(false, true).map { rocksdb =>
        val (rate, stateRows) = measure(spark, input, rocksdb)
        val label = s"${if (rocksdb) "rocksdb" else "hdfs"}_$cardinality"
        System.err.println(s"[statescale] $label -> ${rate.toLong} rows/s, state=$stateRows")
        label -> (rate, stateRows)
      } finally pipeline.TempFiles.deleteTree(input)
    }
    val json = results.map { case (l, (r, s)) =>
      s""""rate_$l":${r.toLong},"state_rows_$l":$s"""
    }.mkString(",")
    println(s"""{"metric":"state_scale_ab","unit":"rows_per_sec",$json}""")
    spark.stop()
  }

  private val NRows = 4000000L
  // hour-ALIGNED base epoch (review finding: an unaligned base straddles two
  // tumbling windows and doubles the intended state cardinality)
  private val BaseEpoch = 1699999200L

  /** Write the replay input once; both provider runs of a cardinality share it.
    * Keys cycle 0..cardinality inside ONE window hour: state rows ==
    * cardinality exactly, and the shuffled file order stays inside the 1 h
    * watermark lag so no rows are dropped as late (state size, not late-data
    * policy, is the variable under test).
    */
  private def writeInput(spark: SparkSession, cardinality: Long): String = {
    val work = java.nio.file.Files.createTempDirectory("graft_statescale_").toString
    spark.range(NRows).select(
      (col("id") % cardinality).as("k"),
      timestamp_seconds(lit(BaseEpoch) + (col("id") % 3600L)).as("ts"),
      (col("id") % 100L).cast("double").as("v"))
      .repartition(80).write.parquet(s"$work/in")
    work
  }

  private def measure(spark: SparkSession, work: String, rocksdb: Boolean): (Double, Long) = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevChangelog = spark.conf.getOption(changelogKey)
    val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    if (rocksdb) {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(changelogKey, "true")
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft_statescale_ckpt_").toString
    val q =
      try spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, ts TIMESTAMP, v DOUBLE"))
        .option("maxFilesPerTrigger", "8").parquet(s"$work/in")
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt).start()
      finally {
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
        if (rocksdb) {
          prevProvider.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
          prevChangelog.fold(spark.conf.unset(changelogKey))(spark.conf.set(changelogKey, _))
        }
      }
    val t0 = System.nanoTime()
    var elapsed = 0.0
    val stateRows =
      try {
        q.processAllAvailable()
        // clock stops before q.stop()/checkpoint deletion — RocksDB's larger
        // checkpoint teardown must not bias the provider comparison (same
        // fix as StatefulApiScale.measure)
        elapsed = (System.nanoTime() - t0) / 1e9
        Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      } finally {
        q.stop()
        pipeline.TempFiles.deleteTree(ckpt)
      }
    (NRows / elapsed, stateRows)
  }
}
