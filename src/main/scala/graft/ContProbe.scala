package graft

import org.apache.spark.sql.{ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** One-off diagnostic: what do the continuous rate source's (value, timestamp)
  * pairs actually look like vs wall-clock? (scratch instrument; not part of
  * the benchmark surface)
  */
object ContProbe {
  object Samples {
    val q = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
  }
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[8]").appName("probe"),
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = java.nio.file.Files.createTempDirectory("probe_").toString
    val src = spark.readStream.format("rate")
      .option("rowsPerSecond", "10000").option("numPartitions", "2").load()
    val q = src.writeStream.foreach(new ForeachWriter[Row] {
      def open(p: Long, e: Long) = true
      def process(r: Row): Unit = {
        val v = r.getLong(1)
        if (v % 1000 == 0)
          Samples.q.add((v, r.getTimestamp(0).getTime, System.currentTimeMillis))
      }
      def close(t: Throwable): Unit = ()
    }).option("checkpointLocation", ckpt).trigger(Trigger.Continuous("1 second")).start()
    Thread.sleep(12000)
    q.stop()
    val t0 = Samples.q.iterator
    var n = 0
    while (t0.hasNext && n < 40) {
      val (v, ts, now) = t0.next()
      println(s"[probe] v=$v ts=$ts now=$now lag=${now - ts}")
      n += 1
    }
    println(s"[probe] total_samples=${Samples.q.size()}")
    spark.stop()
  }
}
