ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hazelcastjetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The round driver captures only a ~2000-char TAIL of `sbt "runMain ..."`
// stdout and parses the bench's one-line JSON out of it. Two pieces of sbt
// decoration have defeated that parse in every round so far: the logger's
// "[info] " prefix on each forked-run stdout line, and the trailing
// "[success] Total time: ..." epilogue that lands AFTER the JSON line.
// StdoutOutput passes the forked process's stdout through verbatim
// (unprefixed), and showSuccess := false drops the epilogue, so the last
// stdout line a capture sees IS the bench's compact JSON line.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ {
  // Single-box harness: put JVM temp files (streaming checkpoints, replay
  // staging, shuffle spill) on tmpfs when the host has one — a finite
  // replay's checkpoint needs no durability, and per-micro-batch commit
  // fsyncs against a loaded disk are pure overhead. A real deployment sets
  // explicit durable checkpointLocation/spark.local.dir; this only moves the
  // UNNAMED temp dirs.
  if (new File("/dev/shm").isDirectory) Seq("-Djava.io.tmpdir=/dev/shm")
  else Seq.empty
}
