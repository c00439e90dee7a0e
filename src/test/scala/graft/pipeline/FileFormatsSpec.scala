package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Connector-matrix round trips (SURVEY §2.1/§2.2 — FileSources.files with
  * Avro/Csv/Json/LinesText/Parquet/RawBytes formats; Sinks.files/json):
  * write via the Sink vocabulary, read back via the Source vocabulary.
  */
class FileFormatsSpec extends SparkSpec {

  import spark.implicits._

  private val p = Pipeline.create(spark)
  private def tmp = Files.createTempDirectory("graft_fmt_").toString

  private val data = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", -1.0))

  test("parquet round trip") {
    val dir = s"$tmp/p"
    p.wrap(data.toDF("id", "name", "x")).writeTo(Sinks.files(dir, "parquet"))
    val back = p.readFrom(Sources.parquet(dir)).toDF
      .as[(Long, String, Double)].collect().toSet
    assert(back === data.toSet)
  }

  test("csv round trip with header + schema inference") {
    val dir = s"$tmp/c"
    p.wrap(data.toDF("id", "name", "x")).writeTo(Sinks.csv(dir))
    val back = p.readFrom(Sources.csv(dir)).toDF
      .select($"id".cast("long"), $"name", $"x".cast("double"))
      .as[(Long, String, Double)].collect().toSet
    assert(back === data.toSet)
  }

  test("json-lines round trip (Sources.json / Sinks.json)") {
    val dir = s"$tmp/j"
    p.wrap(data.toDF("id", "name", "x")).writeTo(Sinks.json(dir))
    val back = p.readFrom(Sources.json(dir)).toDF
      .select($"id", $"name", $"x")
      .as[(Long, String, Double)].collect().toSet
    assert(back === data.toSet)
  }

  test("text lines + binaryFile formats") {
    val dir = s"$tmp/t"
    p.wrap(data.map(_._2).toDF("value")).writeTo(Sinks.files(dir, "text"))
    val lines = p.readFrom(Sources.text(dir)).toDF
      .as[String].collect().toSet
    assert(lines === data.map(_._2).toSet)
    // RawBytesFileFormat analog: whole-file binary records with metadata
    val bin = p.readFrom(Sources.files(dir, "binaryFile", Map("pathGlobFilter" -> "*.txt")))
      .toDF.select("path", "length", "content")
    assert(bin.columns.contains("content"))
  }
}
