package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** fMGWS vs transformWithState A/B — the measurement behind
  * `StatefulOps.mapStatefulTws`'s guidance ("prefer the TWS variant when
  * keyed state is large"). Same custom stateful op (per-key running count,
  * one output per input — Jet's keyed `mapStateful` shape) replayed through
  * three engine paths at two state cardinalities:
  *
  *   - fmgws_hdfs:    flatMapGroupsWithState on the default HDFS-backed store
  *   - fmgws_rocksdb: same API on RocksDB + changelog (isolates the provider)
  *   - tws_rocksdb:   StatefulProcessor/transformWithState (RocksDB required)
  *
  * Workload mirrors StateScale: N rows pre-written parquet, ~10 micro-batch
  * file replay, noop sink; rate = rows / wall-seconds, state rows confirmed
  * from the final progress event. Recorded in BASELINE.md, not gated.
  */
object StatefulApiScale {

  private val NRows = 2000000L

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("graft-statefulapi"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = Seq(200L, 1000000L).flatMap { cardinality =>
      val work = writeInput(spark, cardinality)
      try Seq("fmgws_hdfs", "fmgws_rocksdb", "tws_rocksdb").map { mode =>
        val (rate, stateRows) = measure(spark, work, mode)
        val label = s"${mode}_$cardinality"
        System.err.println(s"[statefulapi] $label -> ${rate.toLong} rows/s, state=$stateRows")
        label -> (rate, stateRows)
      } finally pipeline.TempFiles.deleteTree(work)
    }
    val json = results.map { case (l, (r, s)) =>
      s""""rate_$l":${r.toLong},"state_rows_$l":$s"""
    }.mkString(",")
    println(s"""{"metric":"stateful_api_ab","unit":"rows_per_sec",$json}""")
    spark.stop()
  }

  private def writeInput(spark: SparkSession, cardinality: Long): String = {
    val work = java.nio.file.Files.createTempDirectory("graft_statefulapi_").toString
    spark.range(NRows).select(
      (col("id") % cardinality).as("k"),
      col("id").as("v"))
      .repartition(80).write.parquet(s"$work/in")
    work
  }

  private def measure(spark: SparkSession, work: String, mode: String): (Double, Long) = {
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevChangelog = spark.conf.getOption(changelogKey)
    val prevNoData = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    if (mode.endsWith("rocksdb")) {
      spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(changelogKey, "true")
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft_statefulapi_ckpt_").toString
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v BIGINT"))
      .option("maxFilesPerTrigger", "8").parquet(s"$work/in")
      .as[(Long, Long)]
    // the identical Jet-mapStateful shape through either API: per-key
    // running count, one (k, count) output per input row
    val out =
      if (mode.startsWith("tws"))
        pipeline.StatefulOps.mapStatefulTws[Long, (Long, Long), Long, (Long, Long)](
          src, _._1, ttlMillis = 0,
          createFn = () => 0L,
          mapFn = (k, acc, _) => { val a = acc + 1; (a, (k, a)) })
      else
        pipeline.StatefulOps.mapStateful[Long, (Long, Long), Long, (Long, Long)](
          src, _._1, ttlMillis = 0,
          createFn = () => 0L,
          mapFn = (k, acc, _) => { val a = acc + 1; (a, (k, a)) })
    val q =
      try out.toDF("k", "n").writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt).start()
      finally {
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
        if (mode.endsWith("rocksdb")) {
          prevProvider.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
          prevChangelog.fold(spark.conf.unset(changelogKey))(spark.conf.set(changelogKey, _))
        }
      }
    val t0 = System.nanoTime()
    var elapsed = 0.0
    val stateRows =
      try {
        q.processAllAvailable()
        // stop the clock BEFORE q.stop() and the checkpoint-tree delete:
        // RocksDB modes leave far larger checkpoints (SSTs + changelog) than
        // the HDFS store, and timing their teardown would bias the exact
        // cross-provider comparison this tool exists to make
        elapsed = (System.nanoTime() - t0) / 1e9
        Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      } finally {
        q.stop()
        pipeline.TempFiles.deleteTree(ckpt)
      }
    (NRows / elapsed, stateRows)
  }
}
