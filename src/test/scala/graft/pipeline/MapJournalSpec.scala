package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Map-journal source parity (reference: Sources.mapJournal, Sources.java:381,
  * StreamEventJournalP): a stream of the KeyedStore's changes —
  * START_FROM_CURRENT semantics, UPSERT and DELETE ops, json-encoded rows.
  */
class MapJournalSpec extends SparkSpec {

  import spark.implicits._

  test("journal streams upserts and deletes happening after subscription") {
    KeyedStore.drop("jrnl_store")
    val journal = KeyedStore.journal(spark, "jrnl_store")
    val job = StreamSinks.memory("jrnl_test", "append")
      .start(journal.select($"op", get_json_object($"key", "$.k").as("k")))

    KeyedStore.upsert("jrnl_store", Seq((1, "a"), (2, "b")).toDF("k", "v"), Seq("k"))
    job.processAllAvailable()
    KeyedStore.delete("jrnl_store", Seq(Tuple1(1)).toDF("k"), Seq("k"))
    job.processAllAvailable()

    val events = spark.table("jrnl_test").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(events.count(_._1 == "UPSERT") === 2)
    assert(events.filter(_._1 == "DELETE").map(_._2) === Seq("1"))
    job.cancel()
    KeyedStore.drop("jrnl_store")
  }

  test("START_FROM_OLDEST replays current entries as SYNC before new changes") {
    KeyedStore.drop("jrnl_old")
    KeyedStore.put("jrnl_old", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val journal = KeyedStore.journal(spark, "jrnl_old", startFromOldest = true)
    val job = StreamSinks.memory("jrnl_old_test", "append")
      .start(journal.select($"op", get_json_object($"value", "$.k").as("k")))
    job.processAllAvailable()
    val syncs = spark.table("jrnl_old_test").filter($"op" === "SYNC")
      .select("k").collect().map(_.getString(0)).sorted
    assert(syncs.toSeq === Seq("1", "2"))
    job.cancel()
    KeyedStore.drop("jrnl_old")
  }
}
