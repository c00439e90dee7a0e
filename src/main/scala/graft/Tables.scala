package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver TESTDATA tables (TPC-H-ish star schema + events/documents/
  * embeddings). See /root/repo/TESTDATA.md and FIXTURES.md.
  *
  * Jet analog: `Sources.files`/`FileSources.files` with `ParquetFileFormat`
  * (reference: hazelcast-jet-core/src/main/java/com/hazelcast/jet/pipeline/file/
  * FileSources.java:66) — in Spark this is just `spark.read.parquet`, which already
  * gives vectorized columnar scans, predicate pushdown, and column pruning.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table; normalizes the `events.ts` nano-timestamp (read as a long via
    * `spark.sql.legacy.parquet.nanosAsLong`) to a proper microsecond TIMESTAMP.
    * Integer division keeps it exact (`ts div 1000`); the fixture data is
    * whole-microsecond so nothing is lost.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` queries see the same names
    * the DuckDB oracle sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
