package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** User-defined metrics (Jet core/metrics/Metrics.java:40 parity): counters
  * incremented inside batch and streaming transforms merge into the driver
  * value and surface on Job.getMetrics under `user.`.
  */
class UserMetricsSpec extends SparkSpec {

  import spark.implicits._

  test("batch transform increments a user counter; value visible driver-side") {
    val evens = UserMetrics.counter(spark, s"evens_${System.nanoTime()}")
    val out = Pipeline.create(spark).readFrom(Sources.items(1 to 100))
      .filter { v => if (v % 2 == 0) evens.increment(); v % 2 == 0 }
      .ds.count()
    assert(out == 50)
    assert(evens.value == 50L)
  }

  test("streaming transform increments a user counter; surfaces in JobHandle.metrics") {
    implicit val sqlCtx = spark.sqlContext
    val name = s"seen_${System.nanoTime()}"
    val seen = UserMetrics.counter(spark, name)
    val mem = MemoryStream[Long]
    val df = mem.toDS().map { v => seen.increment(); v }.toDF("v")
    val job = StreamSinks.memory(s"um_${System.nanoTime()}", "append").start(df)
    mem.addData(1L, 2L, 3L)
    job.processAllAvailable()
    assert(seen.value == 3L)
    assert(job.metrics.get(s"user.$name").contains(3.0))
    job.cancel()
  }
}
