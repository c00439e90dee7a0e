package graft

/** Standing instrument for the calibration probe itself: run
  * [[Bench.calibrate]] N times in one bench-shaped session (same warmup the
  * bench gives it) and print one JSON line per run — components, composite,
  * and the factor vs the frozen [[Bench.CalibrationRef]]. Two uses:
  *
  *  - (re)freezing `CalibrationRef` — every freeze gets a BASELINE.md entry
  *    with this instrument's output (idle box, stated run count);
  *  - measuring the probe's own spread on a box before trusting a round's
  *    `queries_norm` (the r14 judge found the probe noisier than the
  *    workload under load; the pre/post agreement band exists because of
  *    this instrument's kind of evidence).
  *
  * Usage: runMain graft.CalibrationProbe [n]
  */
object CalibrationProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 3
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-calibprobe")
    Bench.streamWarmup(spark)
    val runs = (1 to n).map { i =>
      val c = Bench.calibrate(spark)
      val composite = c.values.sum
      val comps = c.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + v }.mkString(",")
      println(f"""{"run":$i,$comps,"composite":$composite,""" +
        f""""factor":${composite / Bench.CalibrationRefComposite}%.4f}""")
      c
    }
    val comps = runs.flatten.groupMap(_._1)(_._2)
    val summary = comps.toSeq.sortBy(_._1).map { case (k, vs) =>
      val sorted = vs.sorted
      "\"" + k + "\":{\"min\":" + sorted.head + ",\"median\":" +
        sorted(sorted.size / 2) + ",\"max\":" + sorted.last + "}"
    }.mkString(",")
    println(s"""{"metric":"calibration_spread","n":$n,$summary,""" +
      s""""ref_composite":${Bench.CalibrationRefComposite}}""")
    spark.stop()
  }
}
