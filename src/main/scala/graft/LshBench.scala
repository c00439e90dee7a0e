package graft

import org.apache.spark.sql.SparkSession

/** Warm single-JVM A/B of the `candidatePairs` mega-bucket guard strategies
  * (see DedupFunctions.candidatePairs): `off` (r3 unguarded floor), `driver`
  * (emptiness probe + exact unguarded plan when clean), `inplan` (broadcast
  * anti/semi split, no driver action). Runs the q47 shape (pairs + connected
  * components) since that is the query the driver's bench flagged.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.LshBench"
  * Never run concurrently with Bench or sbt test (contention corrupts it).
  */
object LshBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_LSH_BENCH_REPS", "3").toInt
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-lsh-bench"),
      shufflePartitions = 32
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(): Unit = {
      val df = queries.TextQueries.q47_dedup_clusters(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    }
    def timed(): Double = {
      val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
    }

    val modes = Seq("off", "driver", "inplan")
    run() // JVM/codegen warm-up, mode irrelevant
    val results = modes.map { m =>
      sys.props("graft.lsh.guard") = m
      val ts = (1 to reps).map(_ => timed())
      m -> (ts.min, ts.sum / ts.size)
    }
    sys.props.remove("graft.lsh.guard")
    results.foreach { case (m, (best, avg)) =>
      println(f"""{"mode":"$m","best_sec":$best%.3f,"avg_sec":$avg%.3f,"reps":$reps}""")
    }
    spark.stop()
  }
}
