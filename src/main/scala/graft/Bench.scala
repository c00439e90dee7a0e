package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every registered query on SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Each query is forced to full materialization via a noop-format
  * write (a bare `count()` would let Catalyst prune most of the work and
  * under-report).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = math.max(4, cpus.toIntOption.getOrElse(32))
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one warmup run of the flagship to amortize JVM/codegen startup out of q1's number
    try queries.QueryRegistry.flagship(spark, sfDir).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
