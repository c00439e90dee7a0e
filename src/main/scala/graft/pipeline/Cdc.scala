package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-envelope CDC source parsing — Jet `extensions/cdc-debezium`
  * (`ChangeRecord.java`, `Operation.java`, `CdcSource.java`): the reference
  * wraps an embedded Debezium engine and exposes each change as a
  * ChangeRecord with operation (r/c/u/d → SYNC/INSERT/UPDATE/DELETE), key,
  * value and sequence. The sandbox has no database connectors, but the
  * Debezium *envelope* is a public JSON wire format — so the parsing layer is
  * real: any json-lines feed of envelopes (file watcher, socket, Kafka topic
  * once jars exist) becomes the same `(op, seq, value…)` change-stream that
  * `StreamSinks.cdcMapSink` MERGEs into a store.
  *
  * Envelope shape (Debezium's documented default, schemas disabled):
  * `{"before": {...}|null, "after": {...}|null, "source": {"ts_ms": …, …},
  *   "op": "c"|"u"|"d"|"r", "ts_ms": …}` — optionally nested one level under
  * `"payload"` when `converter.schemas.enable=true`.
  */
object Cdc {

  /** Envelope schema for a given value-row schema. */
  def envelopeSchema(valueSchema: StructType): StructType = StructType(Seq(
    StructField("before", valueSchema),
    StructField("after", valueSchema),
    StructField("source", StructType(Seq(
      StructField("ts_ms", LongType),
      StructField("table", StringType),
      StructField("lsn", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Debezium op code → Jet `Operation` name (Operation.java:21-27). */
  val opName: Column = {
    val c = col("__env.op")
    when(c === "r", "SYNC").when(c === "c", "INSERT")
      .when(c === "u", "UPDATE").when(c === "d", "DELETE")
      .otherwise(upper(c))
  }

  /** Parse a column of envelope JSON strings into the flat change-record
    * shape `(op, seq, <value columns>)` that `StreamSinks.cdcMapSink`
    * consumes. DELETE rows carry `before` (after is null, per the envelope
    * contract); everything else carries `after`. `seq` is the source change
    * position (`source.lsn` when present, else `source.ts_ms`, else the
    * envelope `ts_ms`) — the same "sequence()" contract as the reference's
    * `ChangeRecord.sequence()`.
    *
    * Works identically on batch and streaming frames: pure column
    * expressions, no state — at 100 TB this is a narrow map over the feed.
    */
  def parseDebezium(df: DataFrame, valueSchema: StructType,
                    jsonCol: String = "value", payloadWrapped: Boolean = false): DataFrame = {
    val envelope =
      if (payloadWrapped) {
        val outer = StructType(Seq(StructField("payload", envelopeSchema(valueSchema))))
        from_json(col(jsonCol), outer).getField("payload")
      } else from_json(col(jsonCol), envelopeSchema(valueSchema))
    val withEnv = df.withColumn("__env", envelope)
    val row = when(col("__env.op") === "d", col("__env.before"))
      .otherwise(col("__env.after"))
    val seq = coalesce(col("__env.source.lsn"), col("__env.source.ts_ms"),
      col("__env.ts_ms"))
    val valueCols = valueSchema.fieldNames.toSeq.map(f => row.getField(f).as(f))
    // the malformed-line guard must test the MATERIALIZED op column: a
    // Column-expression filter pushes through the projection with op
    // replaced by its DEFINITION, re-evaluating the whole from_json parse
    // once per op-code branch below any upstream exchange (measured: 5
    // re-parses per row collapsed into one pre-shuffle task, 6 s for 150k
    // rows at sf0.1 — and Spark 4 substitutes even nondeterministic
    // projection fields, so expression-level barriers don't hold). A typed
    // lambda filter is opaque to Catalyst and stays exactly here; its
    // per-row object cost is noise next to the JSON parse it guards.
    withEnv.select((opName.as("op") +: seq.as("seq") +: valueCols): _*)
      .filter((r: org.apache.spark.sql.Row) => !r.isNullAt(0))
  }

  // ------------------------------------------------- connector dialects
  //
  // The reference ships per-database source modules (extensions/cdc-mysql
  // `MySqlCdcSources.java`, extensions/cdc-postgres `PostgresCdcSources.java`)
  // whose envelopes differ in the `source` block: MySQL's change position is
  // the binlog (file, pos) pair and snapshot rows carry a snapshot marker;
  // Postgres' position is the WAL LSN with a txId. Both parse to the SAME
  // flat change-record frame as [[parseDebezium]] — Jet likewise funnels both
  // into one ChangeRecord with a dialect-specific sequence().

  /** MySQL connector source block (Debezium `io.debezium.connector.mysql`):
    * binlog coordinates + snapshot marker.
    */
  def mySqlEnvelopeSchema(valueSchema: StructType): StructType = StructType(Seq(
    StructField("before", valueSchema),
    StructField("after", valueSchema),
    StructField("source", StructType(Seq(
      StructField("version", StringType),
      StructField("connector", StringType),
      StructField("name", StringType),
      StructField("ts_ms", LongType),
      StructField("snapshot", StringType),
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("server_id", LongType),
      StructField("gtid", StringType),
      StructField("file", StringType),
      StructField("pos", LongType),
      StructField("row", IntegerType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Postgres connector source block (`io.debezium.connector.postgresql`):
    * WAL LSN + transaction id.
    */
  def postgresEnvelopeSchema(valueSchema: StructType): StructType = StructType(Seq(
    StructField("before", valueSchema),
    StructField("after", valueSchema),
    StructField("source", StructType(Seq(
      StructField("version", StringType),
      StructField("connector", StringType),
      StructField("name", StringType),
      StructField("ts_ms", LongType),
      StructField("snapshot", StringType),
      StructField("db", StringType),
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField("txId", LongType),
      StructField("lsn", LongType),
      StructField("xmin", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Shared dialect core: parse with `schema`, emit `(op, seq, <value>)`.
    * Snapshot-marked rows (`source.snapshot` ∈ true/last/incremental) map to
    * SYNC regardless of op code — the reference's cdc connectors expose
    * snapshot reads as `Operation.SYNC` while some connector versions stamp
    * them `"c"` on re-snapshot.
    */
  private def parseDialect(df: DataFrame, valueSchema: StructType,
                           schema: StructType, jsonCol: String,
                           payloadWrapped: Boolean, seq: Column): DataFrame = {
    val envelope =
      if (payloadWrapped) {
        val outer = StructType(Seq(StructField("payload", schema)))
        from_json(col(jsonCol), outer).getField("payload")
      } else from_json(col(jsonCol), schema)
    val withEnv = df.withColumn("__env", envelope)
    val row = when(col("__env.op") === "d", col("__env.before"))
      .otherwise(col("__env.after"))
    val op = when(lower(col("__env.source.snapshot"))
        .isin("true", "last", "incremental"), "SYNC")
      .otherwise(opName)
    val valueCols = valueSchema.fieldNames.toSeq.map(f => row.getField(f).as(f))
    // same pushdown barrier as parseDebezium (see the comment there): a
    // typed lambda filter keeps the guard testing the MATERIALIZED op
    // instead of re-parsing the envelope under an upstream exchange
    withEnv.select((op.as("op") +: seq.as("seq") +: valueCols): _*)
      .filter((r: org.apache.spark.sql.Row) => !r.isNullAt(0))
  }

  /** MySQL envelope → change records. `seq` is the binlog position encoded
    * monotonically: (numeric suffix of the binlog file) · 2³² + pos — binlog
    * files rotate at ≤ 1 GiB so pos fits well under 2³², and file indexes
    * are strictly increasing, making seq totally ordered across rotations.
    * This STRENGTHENS the reference's contract: cdc-mysql's
    * MySqlSequenceExtractor keeps sequence = pos scoped to a per-binlog-file
    * source (hashed file name), so ordering there holds only within one
    * file; the single packed seq here is totally ordered across rotations
    * too. Falls back to source.ts_ms when coordinates are
    * absent (e.g. snapshot rows from very old connector versions).
    */
  def parseMySql(df: DataFrame, valueSchema: StructType,
                 jsonCol: String = "value",
                 payloadWrapped: Boolean = false): DataFrame = {
    val fileIdx = regexp_extract(col("__env.source.file"), "(\\d+)$", 1)
    val binlogSeq = when(col("__env.source.file").isNotNull &&
        col("__env.source.pos").isNotNull,
      fileIdx.cast(LongType) * lit(4294967296L) + col("__env.source.pos"))
    parseDialect(df, valueSchema, mySqlEnvelopeSchema(valueSchema), jsonCol,
      payloadWrapped,
      coalesce(binlogSeq, col("__env.source.ts_ms"), col("__env.ts_ms")))
  }

  /** Postgres envelope → change records. `seq` is the WAL LSN (already a
    * monotone 64-bit position), falling back to txId, then timestamps.
    */
  def parsePostgres(df: DataFrame, valueSchema: StructType,
                    jsonCol: String = "value",
                    payloadWrapped: Boolean = false): DataFrame =
    parseDialect(df, valueSchema, postgresEnvelopeSchema(valueSchema), jsonCol,
      payloadWrapped,
      coalesce(col("__env.source.lsn"), col("__env.source.txId"),
        col("__env.source.ts_ms"), col("__env.ts_ms")))

  /** File-watcher CDC feed: tail a directory of Debezium envelope json-lines
    * (the shape a Debezium server's file/topic dump produces) as a streaming
    * change-record frame. Pair with `StreamSinks.cdcMapSink` for the full
    * reference pipeline: watch → parse → MERGE into store.
    */
  def debeziumFileStream(spark: SparkSession, dir: String,
                         valueSchema: StructType,
                         payloadWrapped: Boolean = false): DataFrame = {
    val raw = spark.readStream.schema(StructType(Seq(StructField("value", StringType))))
      .text(dir)
    parseDebezium(raw, valueSchema, "value", payloadWrapped)
  }
}
