package graft.pipeline

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.SparkFiles
import org.apache.spark.sql.DataFrame

/** `mapUsingPython` against a REAL python3 runtime — the reference's Python
  * transform contract (extensions/python `PythonTransforms.java:47-55` +
  * `PythonServiceConfig`: the user supplies a handler module defining
  * `transform_list(input_list) -> output_list`, the engine feeds batches of
  * strings and expects one output per input, in order).
  *
  * Architecture differences from the reference, deliberately Spark-first:
  * Jet ships gRPC workers + a JEP in-process option; here the worker is a
  * plain `python3 -u` child per task speaking the line protocol of
  * [[SubprocessTransforms]] (pipelined, order-preserving, 1:1-checked, crash
  * = loud failure with the stderr tail). Only the python STDLIB is required
  * — no pip, no gRPC — which is what a zero-egress cluster can actually
  * promise. The generated host script batches stdin lines (`batchSize`,
  * reference default 512 via PythonServiceConfig) and calls the user's
  * `transform_list` per batch, so handler authors get the reference's exact
  * function signature and batching shape.
  *
  * Distribution: handler + host script ship through `SparkContext.addFile`
  * and resolve on executors via `SparkFiles.get` — the cluster-correct path
  * (same mechanism as the reference's attached-file channel); local mode
  * resolves to the same files.
  *
  * Line protocol caveat (same as every line worker): strings must not
  * contain raw newlines — JSON-escape or base64 first.
  */
object PythonTransforms {

  /** The generated host script: imports the shipped handler module by path,
    * reads stdin lines, batches, calls `transform_list` (or the configured
    * function), asserts the 1:1 contract, emits + flushes per batch.
    */
  private def hostScript(batchSize: Int): String =
    s"""import sys, importlib.util
       |
       |mod_path, fn_name = sys.argv[1], sys.argv[2]
       |spec = importlib.util.spec_from_file_location("graft_handler", mod_path)
       |mod = importlib.util.module_from_spec(spec)
       |spec.loader.exec_module(mod)
       |fn = getattr(mod, fn_name)
       |
       |batch = []
       |def flush():
       |    global batch
       |    if not batch:
       |        return
       |    out = fn(batch)
       |    if len(out) != len(batch):
       |        raise AssertionError(
       |            "%s returned %d outputs for %d inputs" % (fn_name, len(out), len(batch)))
       |    for o in out:
       |        sys.stdout.write(str(o))
       |        sys.stdout.write("\\n")
       |    sys.stdout.flush()
       |    batch = []
       |
       |for line in sys.stdin:
       |    batch.append(line[:-1] if line.endswith("\\n") else line)
       |    if len(batch) >= $batchSize:
       |        flush()
       |flush()
       |""".stripMargin

  /** Rewrite STRING column `colName` through the user's python handler.
    * Reference-parity entry point: handlerFile = the user's module
    * (`setHandlerModule`), handlerFunction defaults to `transform_list`
    * (`setHandlerFunction`), batchSize mirrors the service batching.
    */
  def mapUsingPython(df: DataFrame, colName: String, handlerFile: String,
                     handlerFunction: String = "transform_list",
                     batchSize: Int = 512,
                     pythonExec: String = "python3"): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val host = Files.createTempFile("graft_py_host_", ".py")
    Files.write(host, hostScript(batchSize).getBytes(UTF_8))
    host.toFile.deleteOnExit()
    sc.addFile(host.toString)
    // ship the handler under a UNIQUE name (like the host script): addFile
    // keys on basename, so two invocations with same-named-but-different
    // handlers in one session would either conflict or serve the stale file
    val handlerCopy = Files.createTempFile("graft_py_handler_", ".py")
    Files.copy(java.nio.file.Paths.get(handlerFile), handlerCopy,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    handlerCopy.toFile.deleteOnExit()
    sc.addFile(handlerCopy.toString)
    val hostName = host.getFileName.toString
    val handlerName = handlerCopy.getFileName.toString
    SubprocessTransforms.transformColumnWith(df, colName,
      () => Seq(pythonExec, "-u", SparkFiles.get(hostName),
        SparkFiles.get(handlerName), handlerFunction),
      Map.empty)
  }

  /** Jet-style stage form: `stage.apply(PythonTransforms.mapUsingPythonStage(...))`
    * over a String stage (the reference's `mapUsingPython(cfg)` shape).
    */
  def mapUsingPythonStage(handlerFile: String,
                          handlerFunction: String = "transform_list",
                          batchSize: Int = 512,
                          pythonExec: String = "python3")
      : BatchStage[String] => BatchStage[String] = stage => {
    val df = stage.ds.toDF("value")
    new BatchStage(
      mapUsingPython(df, "value", handlerFile, handlerFunction, batchSize,
        pythonExec)
        .selectExpr("value")
        .as[String](org.apache.spark.sql.Encoders.STRING))
  }
}
