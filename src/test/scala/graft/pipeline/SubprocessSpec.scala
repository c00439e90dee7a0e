package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SubprocessTransforms — the mapUsingPython-analog seam (reference:
  * extensions/python/.../PythonTransforms.java, PythonService.java). The
  * worker here is a shell one-liner (the sandbox has no Python for engine
  * code); the contract under test — one worker per partition, line protocol,
  * one-in-one-out order, loud failure on short/excess/nonzero-exit — is
  * worker-agnostic.
  */
class SubprocessSpec extends SparkSpec {

  import spark.implicits._

  test("identity worker (cat) round-trips every row, multi-partition") {
    val in = (1 to 500).map(i => s"doc-$i")
    val stage = new BatchStage(spark.createDataset(in).repartition(4))
    val out = stage.apply(SubprocessTransforms.mapUsingSubprocess(Seq("/bin/cat")))
      .ds.collect().toSet
    assert(out == in.toSet)
  }

  test("transforming worker (tr upper-case) maps in order within partitions") {
    val in = (1 to 100).map(i => s"line$i")
    val stage = new BatchStage(spark.createDataset(in).repartition(2))
    val out = stage
      .apply(SubprocessTransforms.mapUsingSubprocess(Seq("/bin/sh", "-c", "tr a-z A-Z")))
      .ds.collect().toSet
    assert(out == in.map(_.toUpperCase).toSet)
  }

  test("worker env vars reach the process") {
    val in = Seq("a", "b", "c")
    val stage = new BatchStage(spark.createDataset(in).coalesce(1))
    val out = stage.apply(SubprocessTransforms.mapUsingSubprocess(
      Seq("/bin/sh", "-c", """while read x; do echo "$x-$GRAFT_TAG"; done"""),
      env = Map("GRAFT_TAG" -> "v7"))).ds.collect().toSet
    assert(out == Set("a-v7", "b-v7", "c-v7"))
  }

  test("transformColumn rewrites one column, preserves the rest (schema'd frame)") {
    val df = spark.createDataset(Seq((1, "alpha", 1.5), (2, "beta", 2.5)))
      .toDF("id", "word", "score").repartition(2)
    val out = SubprocessTransforms.transformColumn(
      df, "word", Seq("/bin/sh", "-c", "tr a-z A-Z"))
    assert(out.schema == df.schema)
    val rows = out.collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set((1, "ALPHA", 1.5), (2, "BETA", 2.5)))
  }

  test("nonzero exit code fails the job loudly with the stderr tail") {
    val stage = new BatchStage(spark.createDataset(Seq("x", "y")).coalesce(1))
    val e = intercept[Exception] {
      stage.apply(SubprocessTransforms.mapUsingSubprocess(
        Seq("/bin/sh", "-c", "cat; echo boom >&2; exit 3"))).ds.collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("exit code 3") || msg.contains("boom"))
  }

  test("short output (worker drops lines) fails rather than silently losing rows") {
    val stage = new BatchStage(
      spark.createDataset((1 to 50).map(_.toString)).coalesce(1))
    val e = intercept[Exception] {
      stage.apply(SubprocessTransforms.mapUsingSubprocess(
        Seq("/bin/sh", "-c", "head -n 1"))).ds.collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("short output") || msg.contains("closed stdin"))
  }

  test("excess output (worker duplicates lines) fails the ordering contract") {
    val stage = new BatchStage(spark.createDataset(Seq("p", "q")).coalesce(1))
    val e = intercept[Exception] {
      stage.apply(SubprocessTransforms.mapUsingSubprocess(
        Seq("/bin/sh", "-c", """while read x; do echo "$x"; echo "$x"; done"""))).ds.collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("excess output") || msg.contains("more than"))
  }

  test("streaming: transformColumn runs inside a micro-batch (narrow op)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Int, String)]
    ms.addData(Seq((1, "aa"), (2, "bb")))
    val df = ms.toDF().toDF("id", "word")
    val out = SubprocessTransforms.transformColumn(
      df, "word", Seq("/bin/sh", "-c", "tr a-z A-Z"))
    val q = out.writeStream.format("memory").queryName("subproc_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("subproc_stream").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "AA"), (2, "BB")))
  }
}
