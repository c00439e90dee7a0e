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

  test("hadoop InputFormat source with per-record projection") {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
    val dir = s"$tmp/h"
    // plain line files — read back through the REAL Hadoop InputFormat path
    // (splits → partitions), projecting (byteOffset, line) like Jet's
    // projectionFn. Writables are reused per record: the projection must copy
    // out, which `.toString`/`.get` do.
    data.map { case (id, name, x) => s"$id,$name,$x" }.toDF("value")
      .coalesce(1).write.text(dir)
    val src = Sources.hadoopInputFormat(
      dir, classOf[TextInputFormat], classOf[LongWritable], classOf[Text]) {
      (off, line) => (off.get(), line.toString)
    }
    val back = p.readFrom(src).ds.collect().toMap
    assert(back.values.toSet === data.map { case (i, n, x) => s"$i,$n,$x" }.toSet)
    assert(back.keys.min === 0L, "first record offset should be 0")
  }

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
