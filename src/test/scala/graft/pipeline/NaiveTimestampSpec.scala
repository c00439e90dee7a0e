package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-wide naive-timestamp (TIMESTAMP_NTZ) handling.
  *
  * Spark 4 reads parquet `timestamp[us]` with isAdjustedToUTC=false as
  * TIMESTAMP_NTZ, which watermarks / window() reject — the failure that
  * silently dropped all 8 timestamp-dependent gate queries in round 5. The
  * fix must hold at the ENGINE surface, not just the gate loader:
  *   1. GraftSession.tune disables parquet NTZ inference, so any parquet read
  *      through the engine (Sources.files, fileWatcher) yields TIMESTAMP;
  *   2. withTimestamps/withNativeTimestamps normalize an NTZ event-time
  *      column (e.g. a user-declared NTZ schema on a json watcher) before
  *      applying the watermark.
  */
class NaiveTimestampSpec extends SparkSpec {

  test("naive timestamp[us] parquet reads as TIMESTAMP through Sources.files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_").toString
    // write via raw parquet-java (NOT spark.write): a Spark-written NTZ file
    // carries Spark's own schema metadata in the footer, which the reader
    // honors regardless of the inference flag. A metadata-free file with
    // timestamp[us] isAdjustedToUTC=false is exactly what pyarrow produces —
    // the shape whose NTZ inference killed the r5 gate.
    locally {
      import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
      import org.apache.parquet.example.data.simple.SimpleGroupFactory
      import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      val schema = Types.buildMessage()
        .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(
          /* isAdjustedToUTC = */ false, LogicalTypeAnnotation.TimeUnit.MICROS))
        .named("ts")
        .required(PrimitiveTypeName.DOUBLE).named("v")
        .named("naive")
      val conf = new org.apache.hadoop.conf.Configuration()
      GroupWriteSupport.setSchema(schema, conf)
      val w = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(s"$dir/part-0.parquet"))
        .withConf(conf).withType(schema).build()
      val f = new SimpleGroupFactory(schema)
      // 2024-01-01T00:00:05 UTC in epoch micros
      w.write(f.newGroup().append("ts", 1704067205000000L).append("v", 1.0))
      w.write(f.newGroup().append("ts", 1704070800000000L).append("v", 2.0))
      w.close()
    }
    val back = Sources.files(dir, "parquet").read(spark)
    assert(back.schema("ts").dataType == TimestampType,
      s"expected TIMESTAMP under tuned session, got ${back.schema("ts").dataType}")
    // the values must label as UTC instants (how the DuckDB oracle reads them)
    val micros = back.filter(col("v") === 1.0)
      .select(unix_micros(col("ts"))).as[Long].head()
    assert(micros == 1704067205000000L)
    // ... and a watermarked window over the engine's own read must plan: this
    // is the exact path (Sources → withTimestamps) that r5's gate died on
    val n = spark.readStream.schema(back.schema).parquet(dir)
    val stage = Pipeline.create(spark).wrapStream(n).withTimestamps("ts", "1 minute")
    val q = stage.df.groupBy(window(col("ts"), "1 hour")).agg(sum(col("v")))
      .writeStream.format("memory").queryName("ntz_parquet_stream")
      .outputMode("complete").start()
    try { q.processAllAvailable(); assert(spark.table("ntz_parquet_stream").count() == 2) }
    finally { q.stop(); TempFiles.deleteTree(dir) }
  }

  test("withTimestamps watermarks an NTZ event-time column (watcher schema path)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_watch_").toString
    val out = java.nio.file.Files.createTempDirectory("graft_ntz_out_").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.json"),
      ("""{"ts":"2024-01-01T00:00:05","v":1.0}""" + "\n" +
        """{"ts":"2024-01-01T00:00:40","v":2.0}""" + "\n" +
        """{"ts":"2024-01-01T01:00:10","v":4.0}""" + "\n")
        .getBytes("UTF-8"))
    // a user-declared NTZ schema — the exact shape the r5 gate died on
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType), StructField("v", DoubleType)))
    val stage = Pipeline.create(spark)
      .readFrom(Sources.jsonWatcher(dir, schema))
      .withTimestamps("ts", "10 seconds") // would throw on NTZ without the fence
    val q = stage.df
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(sum(col("v")).as("total"))
      .writeStream.format("memory").queryName("ntz_watch")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ntz_watch")
        .select(col("w.start").cast("string"), col("total"))
        .as[(String, Double)].collect().toMap
      assert(rows == Map(
        "2024-01-01 00:00:00" -> 3.0,
        "2024-01-01 01:00:00" -> 4.0))
    } finally {
      q.stop()
      TempFiles.deleteTree(dir); TempFiles.deleteTree(out)
    }
  }

  test("Tables refuses a non-UTC session (would silently shift event times)") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.Tables(spark, sf, "events")
      }
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
