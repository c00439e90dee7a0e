package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query job-count profiler: runs named queries (args) with a listener
  * counting Spark jobs, tasks, and summed task time vs wall time. The gap
  * between wall time and parallel task time is DRIVER-SIDE latency — per-job
  * scheduling barriers, catalog ops, micro-batch commits — which is exactly
  * the cost class that inflates 3-5× under external CPU load while bulk
  * compute inflates ~1.2× (BENCH_r6 vs local analysis, round 7). A query
  * whose wall time is dominated by job count × per-job floor, not task time,
  * is latency-bound: the fix is fewer jobs, not faster tasks.
  *
  * Usage: sbt "runMain graft.JobProfile q67_merge_sink q47_dedup_clusters"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    @volatile var jobs = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var jobNanos = 0L // sum of per-job wall durations (serialized driver view)
    val verbose = sys.env.contains("GRAFT_PROFILE_VERBOSE")
    val jobTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; jobStarts.put(j.jobId, System.nanoTime())
        j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
        jobTasks.put(j.jobId, (0, 0L))
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStarts.remove(j.jobId)).foreach { t0 =>
          val dt = System.nanoTime() - t0
          jobNanos += dt
          if (verbose) {
            val (tc, tn) = jobTasks.getOrDefault(j.jobId, (0, 0L))
            println(f"  job=${j.jobId}%4d wall=${dt / 1e9}%6.3fs tasks=$tc%5d taskTime=${tn / 1e9}%7.2fs")
          }
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val d = if (t.taskInfo != null) (t.taskInfo.duration max 0L) * 1000000L else 0L
        taskNanos += d
        Option(stageToJob.get(t.stageId)).foreach { jid =>
          jobTasks.merge(jid, (1, d), (a, b) => (a._1 + b._1, a._2 + b._2)); ()
        }
      }
    })
    // same warmup as Bench so first-query numbers are comparable
    try queries.QueryRegistry.flagship(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    Thread.sleep(500)
    for (name <- args) {
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"unknown query: $name")
        case Some(fn) =>
          jobs = 0; tasks = 0; taskNanos = 0L; jobNanos = 0L
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // let listener drain
          println(f"$name%-32s wall=$wall%6.2fs jobs=$jobs%4d tasks=$tasks%6d " +
            f"taskTime=${taskNanos / 1e9}%8.1fs jobWall=${jobNanos / 1e9}%6.2fs " +
            f"perJobFloor=${wall / math.max(1, jobs)}%6.3fs")
          pipeline.KeyedStore.clear()
          spark.catalog.clearCache()
          System.gc()
      }
    }
    spark.stop()
  }
}
