package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The NEXMark-style rate-source workload shared by the calibration
  * instruments (`MaxRate`, `Latency`) — one definition so the latency profile
  * always measures exactly the pipeline whose rate ceiling was published.
  */
object RateWorkloads {

  /** Rate source shaped to (ts, event_type, value). */
  def shaped(spark: SparkSession, rowsPerSecond: Long, partitions: Int = 8): DataFrame = {
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .option("numPartitions", partitions.toString)
      .load() // schema: timestamp, value
    src.select(col("timestamp").as("ts"),
      (col("value") % 100).cast("string").as("event_type"),
      (col("value") % 1000).cast("double").as("value"))
  }

  /** Keyed tumbling-window count+sum — the stateful calibration pipeline. */
  def statefulAgg(shaped: DataFrame): DataFrame =
    shaped.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "5 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Row-local filter+projection — the stateless calibration pipeline. */
  def statelessMap(shaped: DataFrame): DataFrame =
    shaped.filter(col("value") >= 0)
      .select(col("event_type"), (col("value") * 2).as("v2"))
}
