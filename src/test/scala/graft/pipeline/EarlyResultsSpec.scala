package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Jet `earlyResultsPeriod` parity (WindowDefinition.java:39-70,
  * SlidingWindowP.java:184-192): Jet emits periodic partial window results
  * before the watermark closes the window. Spark's equivalent is **update
  * output mode**: every micro-batch emits the windows whose aggregate changed
  * — same observable contract (partial results superseded by the final one),
  * paced by micro-batches instead of a wall-clock period (SURVEY §7.3/§7.4
  * decision).
  */
class EarlyResultsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("update mode emits partial window results before the window closes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]

    val agged = new StreamSourceStage(mem.toDF.toDF("ts", "v"))
      .withTimestamps("ts", "10 minutes")
      .window(WindowDefinition.tumbling("1 hour"))
      .aggregate(AggregateOperations.allOf(
        AggregateOperations.counting("n"),
        AggregateOperations.summingDouble(col("v"), "s")))

    // update mode = early results: each micro-batch re-emits the changed window
    val job = StreamSinks.memory("early_test", "update").start(agged)

    mem.addData((ts("2024-01-01 00:05:00"), 1.0))
    job.processAllAvailable()
    val early = spark.table("early_test").select("n", "s").collect()
    assert(early.length === 1 && early(0).getLong(0) === 1) // partial result emitted

    mem.addData((ts("2024-01-01 00:20:00"), 2.0))
    job.processAllAvailable()
    // the same window was re-emitted with the updated aggregate (Jet early
    // result followed by a fresher one); memory sink in update mode appends,
    // so both emissions are visible
    val all = spark.table("early_test").select("n", "s").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(all.toSeq === Seq((1L, 1.0), (2L, 3.0)))
    job.cancel()
  }
}
