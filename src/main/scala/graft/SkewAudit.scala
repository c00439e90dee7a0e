package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-skew audit (guide §2.5, r20 diagnostic): per stage, the task-duration
  * and shuffle-read distributions — max vs median — for named queries. A
  * max/median ratio above ~5 on a stage with many tasks is the skew signature
  * (one hot key owning a partition); ratios near 1 say AQE/salting has
  * nothing to fix. Run at the 10×/100× rungs (SPARK_GRAFT_SF_DIR at a
  * ScaleTrend replica) where skew would actually show — gate-scale
  * partitions are too small to differentiate. Diagnostic only; prints one
  * line per stage with >= minTasks tasks plus a per-query verdict.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  *        sbt "runMain graft.SkewAudit q86_cross_corpus_dedup q93_containment"
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewAudit <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val minTasks = sys.env.getOrElse("SPARK_GRAFT_SKEW_MIN_TASKS", "8").toInt
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-skew-audit")
    spark.sparkContext.setLogLevel("WARN")
    // per-stage task durations + shuffle-read bytes
    val durations = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          val sr = Option(t.taskMetrics)
            .map(_.shuffleReadMetrics.totalBytesRead).getOrElse(0L)
          durations.computeIfAbsent(t.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]())
            .add((t.taskInfo.duration max 0L, sr))
          ()
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageNames.put(sc.stageInfo.stageId,
          sc.stageInfo.name.takeWhile(_ != '(').trim)
        ()
      }
    })
    args.foreach { name =>
      durations.clear(); stageNames.clear()
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      var worst = 0.0
      println(f"[skew] $name wall=$wall%.2fs  (stages with >= $minTasks tasks)")
      durations.asScala.toSeq.sortBy(_._1).foreach { case (sid, q) =>
        val ds = q.asScala.map(_._1).toSeq.sorted
        if (ds.size >= minTasks) {
          val srs = q.asScala.map(_._2).toSeq.sorted
          val med = ds(ds.size / 2).max(1L)
          val ratio = ds.last.toDouble / med
          worst = math.max(worst, ratio)
          println(f"[skew]   stage=$sid%4d tasks=${ds.size}%5d " +
            f"dur med/max=${med}ms/${ds.last}ms ratio=$ratio%.1f " +
            f"shufRead med/max=${srs(srs.size / 2)}/${srs.last} B " +
            f"${stageNames.getOrDefault(sid, "")}")
        }
      }
      println(f"[skew] $name verdict: worst dur max/median=$worst%.1f " +
        (if (worst >= 5.0) "-- SKEWED (guide 2.5: salt or split the hot key)"
         else "-- no actionable skew (below the 5x signature)"))
      pipeline.KeyedStore.clear()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
