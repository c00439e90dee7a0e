package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name prefixes to run (local
    // iteration filter; the driver always runs the full registry)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(",").toSeq) else None
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = math.max(4, cpus.toIntOption.getOrElse(4))
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // plan-freshness gate (VERDICT r10 item 8): compare each headline
    // query's pre-execution plan shape against PLANS.md's fingerprint table
    // — a drifted plan is a silent perf regression until the bench notices;
    // this turns it into a diff at correctness time. Drift WARNS (and is
    // recorded in plan_drift.txt); intentional changes regenerate PLANS.md.
    val knownFingerprints: Map[String, String] =
      try Plans.parseFingerprints(Files.readString(Paths.get("PLANS.md")))
      catch { case _: Throwable => Map.empty }
    val drift = Seq.newBuilder[String]
    SparkEntry.queries.filter(e => selected(e._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        knownFingerprints.get(name).foreach { expected =>
          val got = Plans.fingerprint(df)
          if (got != expected) {
            System.err.println(
              s"[verify] PLAN-DRIFT $name: $expected -> $got (regenerate PLANS.md or fix the plan)")
            drift += s"$name $expected -> $got"
          }
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // delete any PREVIOUS run's output for this query: a stale parquet
        // would make the differential check silently validate old results
        pipeline.TempFiles.deleteTree(s"$outDir/$name")
      }
    }
    val drifted = drift.result()
    Files.writeString(Paths.get(s"$outDir/plan_drift.txt"),
      if (drifted.isEmpty) "none\n" else drifted.mkString("", "\n", "\n"))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    spark.stop()
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The full oracle map as a JSON object (shared with OracleLintSpec). */
  def oracleJson: String = SparkEntry.oracleSql
    .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
    .mkString("{", ",", "}")
}
