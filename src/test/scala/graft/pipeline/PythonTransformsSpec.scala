package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec

/** End-to-end `mapUsingPython` against the REAL python3 runtime in this
  * environment (3.11, stdlib only) — upgrading the subprocess seam's
  * cat/tr coverage to the reference's actual contract: a user handler
  * module exposing `transform_list(input_list) -> output_list`, fed in
  * batches, one output per input, errors surfaced loudly.
  */
class PythonTransformsSpec extends SparkSpec {

  import spark.implicits._

  private def handler(name: String, body: String): String = {
    val f = Files.createTempFile(s"graft_${name}_", ".py")
    Files.write(f, body.getBytes(UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("transform_list handler rewrites a column through real python3") {
    val h = handler("upper", """def transform_list(items):
                               |    return [s.upper() + "!" for s in items]
                               |""".stripMargin)
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "txt")
    val out = PythonTransforms.mapUsingPython(df, "txt", h)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, "ALPHA!"), (2L, "BETA!"), (3L, "GAMMA!")))
  }

  test("handler sees BATCHES of the configured size (the reference's list contract)") {
    val h = handler("batches", """def transform_list(items):
                                 |    n = len(items)
                                 |    return ["%s|%d" % (s, n) for s in items]
                                 |""".stripMargin)
    // 10 rows in ONE partition at batchSize=3 -> batches 3,3,3,1
    val df = spark.range(10).selectExpr("id", "cast(id as string) AS txt")
      .repartition(1)
    val out = PythonTransforms.mapUsingPython(df, "txt", h, batchSize = 3)
      .selectExpr("txt").as[String].collect()
    val sizes = out.map(_.split('|')(1).toInt).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(sizes === Map(3 -> 9, 1 -> 1), s"batch shape was $sizes")
  }

  test("a raising handler fails the job loudly, carrying the python traceback") {
    val h = handler("boom", """def transform_list(items):
                              |    raise ValueError("handler exploded")
                              |""".stripMargin)
    val df = Seq("x").toDF("txt")
    val e = intercept[Exception] {
      PythonTransforms.mapUsingPython(df, "txt", h).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("handler exploded"),
      s"python stderr tail not surfaced: ${messages(e).take(500)}")
  }

  test("stage form round-trips a typed String stage (Jet mapUsingPython shape)") {
    val h = handler("suffix", """def transform_list(items):
                                |    return [s + "-py" for s in items]
                                |""".stripMargin)
    val stage = new BatchStage(Seq("a", "b").toDS())
    val out = PythonTransforms.mapUsingPythonStage(h)(stage)
      .ds.collect().sorted
    assert(out.toSeq === Seq("a-py", "b-py"))
  }
}
