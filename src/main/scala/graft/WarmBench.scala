package graft

import org.apache.spark.sql.SparkSession

/** Warm per-query micro-bench: one JVM, per query a warm-up run then
  * best-of-N timed runs (cache cleared between runs). Use this — never two
  * full Bench invocations — to A/B a single query's plan change: full-bench
  * numbers carry JVM warm-up and run-position effects bigger than most
  * plan deltas (see BASELINE.md round-4 post-mortem).
  *
  * Usage: SPARK_GRAFT_WARM_QUERIES=q74,q44 [SPARK_GRAFT_WARM_REPS=3]
  *        SPARK_GRAFT_SF_DIR=... sbt "runMain graft.WarmBench"
  */
object WarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_WARM_REPS", "3").toInt
    val names = sys.env.getOrElse("SPARK_GRAFT_WARM_QUERIES", "")
      .split(',').filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_WARM_QUERIES=q..,q..")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-warmbench"),
      shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val registry = SparkEntry.queries
    names.foreach { prefix =>
      val (name, fn) = registry.find(_._1.startsWith(prefix))
        .getOrElse(sys.error(s"no registry query matches '$prefix'"))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }
      once() // warm-up
      val ts = (1 to reps).map(_ => once())
      println(f"""{"query":"$name","best_sec":${ts.min}%.3f,"avg_sec":${ts.sum / reps}%.3f,"reps":$reps}""")
    }
    spark.stop()
  }
}
