package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` of named declared queries to files —
  * the before/after plan evidence for optimization rounds
  * (`plans/r<N>/<query>_<tag>.txt`). Usage:
  *
  *   sbt "runMain graft.PlanDump plans/r19 before q108_nb_classifier,q107_span_excision"
  *
  * Plans are captured PRE-execution (same stage Plans.fingerprint hashes) at
  * SPARK_GRAFT_SF_DIR (default sf0.1 — the bench rung, so stats-driven
  * choices like broadcast selection match what the bench plan sees).
  * Queries that drive streaming jobs or compose on the driver have no single
  * batch plan; for those this dumps the plan of the RESULT frame (still
  * useful: it shows the final exchange/sink shape) and notes it in a header.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <q1,q2,...>")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "graft-plandump")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"),
        s"# $name ($tag) — explain(formatted) at $sfDir\n$txt")
      println(s"[plandump] wrote ${outDir.resolve(s"${name}_$tag.txt")}")
    }
    spark.stop()
  }
}
