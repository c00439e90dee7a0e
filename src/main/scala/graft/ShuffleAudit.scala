package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume audit — the "would this plan survive a 100× scale-up"
  * question, measured instead of eyeballed: per query, total bytes read from
  * the source vs bytes written to + read from shuffles, and the stage count.
  * A query whose shuffle volume is a small fraction of its input scales on
  * the scan; one that shuffles a multiple of its input is bottlenecked on
  * the exchange at cluster scale and needs a broadcast / pre-aggregation /
  * partitioning fix. Results are recorded in BASELINE.md with per-query
  * commentary; the audit is diagnostic, not gated.
  *
  * Usage: [SPARK_GRAFT_AUDIT_QUERIES=q01,q36,...] SPARK_GRAFT_SF_DIR=...
  *        sbt "runMain graft.ShuffleAudit"
  */
object ShuffleAudit {

  private final class Acc extends SparkListener {
    val input = new AtomicLong
    val shufWrite = new AtomicLong
    val shufRead = new AtomicLong
    val stages = new AtomicInteger
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        input.addAndGet(m.inputMetrics.bytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        stages.incrementAndGet()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val defaults = "q01,q04,q14,q19,q29,q35,q36,q39,q44,q47,q68,q74,q79,q81,q83,q86,q90,q93"
    val names = sys.env.getOrElse("SPARK_GRAFT_AUDIT_QUERIES", defaults)
      .split(',').filter(_.nonEmpty).toSeq
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-shuffle-audit"),
      shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = SparkEntry.queries
    names.foreach { prefix =>
      val (name, fn) = registry.find(_._1.startsWith(prefix))
        .getOrElse(sys.error(s"no registry query matches '$prefix'"))
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        Thread.sleep(800) // let the async listener bus drain
      } finally spark.sparkContext.removeSparkListener(acc)
      def mb(l: Long): Double = math.round(l / 1048.576) / 1000.0
      println(f"""{"query":"$name","input_mb":${mb(acc.input.get)},""" +
        f""""shuffle_write_mb":${mb(acc.shufWrite.get)},""" +
        f""""shuffle_read_mb":${mb(acc.shufRead.get)},"stages":${acc.stages.get}}""")
    }
    spark.stop()
  }
}
