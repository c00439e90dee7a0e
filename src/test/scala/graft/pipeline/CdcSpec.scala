package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

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
}
