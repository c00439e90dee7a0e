package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import scala.jdk.CollectionConverters._

/** CDC apply parity (reference: extensions/cdc-debezium — CdcSinks.map,
  * Operation.java SYNC/INSERT/UPDATE/DELETE): a stream of change records
  * MERGEd into the KeyedStore per micro-batch, last change per key wins,
  * DELETE removes the key. FIXTURES.md §2 change-record shape.
  */
class CdcSpec extends SparkSpec {

  import spark.implicits._

  test("change stream applies insert/update/delete with last-per-key-wins") {
    implicit val sqlCtx = spark.sqlContext
    KeyedStore.drop("cdc_store")
    val mem = MemoryStream[(String, Long, Long, String)] // (op, seq, id, v)

    val job = StreamSinks.cdcMapSink("cdc_store", keyCols = Seq("id"))
      .start(mem.toDF.toDF("op", "seq", "id", "v"))

    // batch 1: initial sync + an in-batch overwrite (seq order must win)
    mem.addData(("SYNC", 1L, 1L, "a"), ("SYNC", 2L, 2L, "b"),
                ("UPDATE", 3L, 2L, "b2"))
    job.processAllAvailable()
    val afterSync = KeyedStore.get(spark, "cdc_store")
      .as[(Long, String)].collect().toMap
    assert(afterSync === Map(1L -> "a", 2L -> "b2"))

    // batch 2: update one key, delete the other, insert a third
    mem.addData(("UPDATE", 4L, 1L, "A"), ("DELETE", 5L, 2L, null),
                ("INSERT", 6L, 3L, "c"))
    job.processAllAvailable()
    val finalState = KeyedStore.get(spark, "cdc_store")
      .as[(Long, String)].collect().toMap
    assert(finalState === Map(1L -> "A", 3L -> "c"))

    job.cancel()
    KeyedStore.drop("cdc_store")
  }

  private val valueSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))

  test("debezium envelope parses op codes, before/after selection, sequence") {
    val lines = Seq(
      """{"before":null,"after":{"id":1,"v":"a"},"source":{"ts_ms":10,"lsn":100},"op":"r","ts_ms":11}""",
      """{"before":null,"after":{"id":2,"v":"b"},"source":{"ts_ms":20,"lsn":200},"op":"c","ts_ms":21}""",
      """{"before":{"id":2,"v":"b"},"after":{"id":2,"v":"b2"},"source":{"ts_ms":30,"lsn":300},"op":"u","ts_ms":31}""",
      """{"before":{"id":1,"v":"a"},"after":null,"source":{"ts_ms":40,"lsn":400},"op":"d","ts_ms":41}""")
    val parsed = Cdc.parseDebezium(lines.toDF("value"), valueSchema)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(parsed === Seq(
      ("SYNC", 100L, 1L, "a"), ("INSERT", 200L, 2L, "b"),
      ("UPDATE", 300L, 2L, "b2"), ("DELETE", 400L, 1L, "a")))
  }

  test("MySQL envelope: binlog (file,pos) sequence, snapshot marker, op codes") {
    // real-shaped io.debezium.connector.mysql envelopes: snapshot read from
    // binlog 000002, then streamed changes crossing a file rotation — the
    // encoded sequence must order pos within a file AND rotations above pos
    val lines = Seq(
      """{"before":null,"after":{"id":1,"v":"a"},"source":{"version":"1.9.7.Final","connector":"mysql","name":"dbz","ts_ms":10,"snapshot":"true","db":"inv","table":"t","server_id":0,"gtid":null,"file":"mysql-bin.000002","pos":1540,"row":0},"op":"r","ts_ms":11}""",
      """{"before":null,"after":{"id":2,"v":"b"},"source":{"version":"1.9.7.Final","connector":"mysql","name":"dbz","ts_ms":20,"snapshot":"false","db":"inv","table":"t","server_id":223344,"gtid":null,"file":"mysql-bin.000002","pos":2845,"row":0},"op":"c","ts_ms":21}""",
      """{"before":{"id":2,"v":"b"},"after":{"id":2,"v":"b2"},"source":{"version":"1.9.7.Final","connector":"mysql","name":"dbz","ts_ms":30,"snapshot":"false","db":"inv","table":"t","server_id":223344,"gtid":null,"file":"mysql-bin.000003","pos":154,"row":0},"op":"u","ts_ms":31}""",
      """{"before":{"id":1,"v":"a"},"after":null,"source":{"version":"1.9.7.Final","connector":"mysql","name":"dbz","ts_ms":40,"snapshot":"false","db":"inv","table":"t","server_id":223344,"gtid":null,"file":"mysql-bin.000003","pos":1201,"row":0},"op":"d","ts_ms":41}""")
    val parsed = Cdc.parseMySql(lines.toDF("value"), valueSchema)
      .as[(String, Long, Long, String)].collect().toSeq
    val g = 4294967296L // 2^32 per binlog file
    assert(parsed === Seq(
      ("SYNC", 2 * g + 1540L, 1L, "a"), ("INSERT", 2 * g + 2845L, 2L, "b"),
      ("UPDATE", 3 * g + 154L, 2L, "b2"), ("DELETE", 3 * g + 1201L, 1L, "a")))
    // the whole point of the encoding: rotation > any pos in the prior file
    val seqs = parsed.map(_._2)
    assert(seqs == seqs.sorted, "binlog sequence must be monotone across rotation")
  }

  test("Postgres envelope: LSN sequence, txId fallback, snapshot marker") {
    // real-shaped io.debezium.connector.postgresql envelopes: snapshot rows
    // carry snapshot:"true" (op r) or "last"; streamed rows carry the WAL LSN
    val lines = Seq(
      """{"before":null,"after":{"id":1,"v":"a"},"source":{"version":"1.9.7.Final","connector":"postgresql","name":"dbz","ts_ms":10,"snapshot":"true","db":"inv","schema":"public","table":"t","txId":555,"lsn":23467800,"xmin":null},"op":"r","ts_ms":11}""",
      """{"before":null,"after":{"id":2,"v":"b"},"source":{"version":"1.9.7.Final","connector":"postgresql","name":"dbz","ts_ms":20,"snapshot":"last","db":"inv","schema":"public","table":"t","txId":555,"lsn":23467900,"xmin":null},"op":"r","ts_ms":21}""",
      """{"before":{"id":2,"v":"b"},"after":{"id":2,"v":"b2"},"source":{"version":"1.9.7.Final","connector":"postgresql","name":"dbz","ts_ms":30,"snapshot":"false","db":"inv","schema":"public","table":"t","txId":556,"lsn":24023128,"xmin":null},"op":"u","ts_ms":31}""",
      """{"before":{"id":1,"v":"a"},"after":null,"source":{"version":"1.9.7.Final","connector":"postgresql","name":"dbz","ts_ms":40,"snapshot":"false","db":"inv","schema":"public","table":"t","txId":557,"lsn":24023416,"xmin":null},"op":"d","ts_ms":41}""")
    val parsed = Cdc.parsePostgres(lines.toDF("value"), valueSchema)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(parsed === Seq(
      ("SYNC", 23467800L, 1L, "a"), ("SYNC", 23467900L, 2L, "b"),
      ("UPDATE", 24023128L, 2L, "b2"), ("DELETE", 24023416L, 1L, "a")))
  }

  test("MySQL dialect stream end-to-end: watch -> parseMySql -> MERGE into store") {
    // the dialect parsers feed the SAME cdcMapSink as the generic path —
    // one ChangeRecord contract, per the reference's CdcSinks.map design
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-mysql").toFile
    KeyedStore.drop("cdc_mysql")
    val raw = spark.readStream.schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .text(dir.getAbsolutePath)
    val changes = Cdc.parseMySql(raw, valueSchema)
    val job = StreamSinks.cdcMapSink("cdc_mysql", keyCols = Seq("id")).start(changes)
    try {
      java.nio.file.Files.write(new java.io.File(dir, "0.json").toPath, Seq(
        """{"before":null,"after":{"id":1,"v":"a"},"source":{"version":"2","connector":"mysql","name":"d","ts_ms":10,"snapshot":"true","db":"i","table":"t","server_id":0,"gtid":null,"file":"mysql-bin.000001","pos":100,"row":0},"op":"r","ts_ms":11}""",
        """{"before":null,"after":{"id":2,"v":"b"},"source":{"version":"2","connector":"mysql","name":"d","ts_ms":20,"snapshot":"false","db":"i","table":"t","server_id":1,"gtid":null,"file":"mysql-bin.000001","pos":200,"row":0},"op":"c","ts_ms":21}"""
      ).asJava)
      job.processAllAvailable()
      assert(KeyedStore.get(spark, "cdc_mysql").as[(Long, String)].collect().toMap
        === Map(1L -> "a", 2L -> "b"))
      // update crossing a binlog rotation + a delete: last-per-key by the
      // encoded binlog sequence must still win
      java.nio.file.Files.write(new java.io.File(dir, "1.json").toPath, Seq(
        """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"A"},"source":{"version":"2","connector":"mysql","name":"d","ts_ms":30,"snapshot":"false","db":"i","table":"t","server_id":1,"gtid":null,"file":"mysql-bin.000002","pos":4,"row":0},"op":"u","ts_ms":31}""",
        """{"before":{"id":2,"v":"b"},"after":null,"source":{"version":"2","connector":"mysql","name":"d","ts_ms":40,"snapshot":"false","db":"i","table":"t","server_id":1,"gtid":null,"file":"mysql-bin.000002","pos":300,"row":0},"op":"d","ts_ms":41}"""
      ).asJava)
      job.processAllAvailable()
      assert(KeyedStore.get(spark, "cdc_mysql").as[(Long, String)].collect().toMap
        === Map(1L -> "A"))
    } finally {
      job.cancel()
      KeyedStore.drop("cdc_mysql")
    }
  }

  test("payload-wrapped envelope (schemas enabled) parses identically") {
    val line =
      """{"schema":{},"payload":{"before":null,"after":{"id":7,"v":"x"},"source":{"ts_ms":5,"lsn":50},"op":"c","ts_ms":6}}"""
    val parsed = Cdc.parseDebezium(Seq(line).toDF("value"), valueSchema,
      payloadWrapped = true).as[(String, Long, Long, String)].collect()
    assert(parsed.toSeq === Seq(("INSERT", 50L, 7L, "x")))
  }

  test("debezium file stream end-to-end: watch -> parse -> MERGE into store") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toFile
    KeyedStore.drop("cdc_dbz")
    val changes = Cdc.debeziumFileStream(spark, dir.getAbsolutePath, valueSchema)
    val job = StreamSinks.cdcMapSink("cdc_dbz", keyCols = Seq("id")).start(changes)
    try {
      java.nio.file.Files.write(new java.io.File(dir, "0.json").toPath, Seq(
        """{"before":null,"after":{"id":1,"v":"a"},"source":{"ts_ms":10,"lsn":1},"op":"r","ts_ms":10}""",
        """{"before":null,"after":{"id":2,"v":"b"},"source":{"ts_ms":20,"lsn":2},"op":"c","ts_ms":20}"""
      ).asJava)
      job.processAllAvailable()
      assert(KeyedStore.get(spark, "cdc_dbz").as[(Long, String)].collect().toMap
        === Map(1L -> "a", 2L -> "b"))

      java.nio.file.Files.write(new java.io.File(dir, "1.json").toPath, Seq(
        """{"before":{"id":1,"v":"a"},"after":{"id":1,"v":"A"},"source":{"ts_ms":30,"lsn":3},"op":"u","ts_ms":30}""",
        """{"before":{"id":2,"v":"b"},"after":null,"source":{"ts_ms":40,"lsn":4},"op":"d","ts_ms":40}"""
      ).asJava)
      job.processAllAvailable()
      assert(KeyedStore.get(spark, "cdc_dbz").as[(Long, String)].collect().toMap
        === Map(1L -> "A"))
    } finally {
      job.cancel()
      KeyedStore.drop("cdc_dbz")
    }
  }
}
