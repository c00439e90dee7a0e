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

  /** Time-bounded stream-stream inner join — the state shape the keyed
    * tumbling probe does not cover: BOTH sides buffer every row until the
    * watermark passes the join bound, so state grows with rate × window
    * rather than with key cardinality. Two independent rate sources at
    * rate/2 each (total input = `rowsPerSecond`); the deterministic value
    * sequence makes matching ~1:1, so output volume tracks input and the
    * keep-up criterion stays meaningful.
    */
  def streamStreamJoin(spark: SparkSession, rowsPerSecond: Long,
                       partitions: Int = 8): DataFrame = {
    def side(tag: String) = spark.readStream.format("rate")
      .option("rowsPerSecond", (rowsPerSecond / 2).toString)
      .option("numPartitions", partitions.toString)
      .load()
      .select(col("timestamp").as(s"ts_$tag"), col("value").as(s"k_$tag"))
      .withWatermark(s"ts_$tag", "10 seconds")
    side("a").join(side("b"), expr(
      "k_a = k_b AND ts_b BETWEEN ts_a - INTERVAL 5 SECONDS AND ts_a + INTERVAL 5 SECONDS"))
  }

  /** Keyed SESSION-window aggregation — the other uncovered state shape:
    * per-key sessions merge on every batch (ranges, not point keys), and a
    * continuously firing key holds its session open indefinitely, so the
    * probe exercises the merge path at a steady ~100 live sessions.
    */
  def sessionAgg(shaped: DataFrame): DataFrame =
    shaped.withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "2 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
