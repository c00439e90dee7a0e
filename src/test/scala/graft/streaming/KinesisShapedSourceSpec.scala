package graft.streaming

import graft.SparkSpec
import graft.pipeline.InMemoryKinesis

/** The Kinesis consumer protocol against the stub stream service:
  * hash-range routing, per-shard ordering, checkpointed per-shard seek,
  * and the resharding rule (children only after the parent drains) — the
  * shard-tracker semantics of the reference's Kinesis connector
  * (extensions/kinesis KinesisSources.java), executed end-to-end through
  * the DSv2 source.
  */
class KinesisShapedSourceSpec extends SparkSpec {

  private var n = 0
  private def fresh(): (String, InMemoryKinesis) = {
    n += 1
    val name = s"kin_${System.nanoTime()}_$n"
    (name, InMemoryKinesis.named(name))
  }

  private def startQuery(service: String, stream: String, sinkTable: String,
                         ckpt: String) =
    spark.readStream.format("graft.streaming.KinesisShapedSource")
      .option("service", service).option("stream", stream).load()
      .writeStream.format("memory").queryName(sinkTable)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

  test("hash-range routing: one partition key -> one shard, per-shard order = put order") {
    val (name, k) = fresh()
    k.createStream("s", 4)
    val keys = (1 to 40).map(i => s"user$i")
    val placed = keys.flatMap { key =>
      (0 until 3).map(j => (key, k.putRecord("s", key, s"$key/$j")._1))
    }
    // every put of a given key landed on the SAME shard
    placed.groupBy(_._1).foreach { case (key, ps) =>
      assert(ps.map(_._2).distinct.size === 1, s"key $key split across shards")
    }
    assert(placed.map(_._2).distinct.size > 1, "keys spread over multiple shards")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kin_route_").toString
    val q = startQuery(name, "s", "kin_route", ckpt)
    try {
      q.processAllAvailable()
      val rows = spark.table("kin_route").collect()
        .map(r => (r.getString(2), r.getLong(0), r.getString(1)))
      assert(rows.length === 120)
      // within each shard, sequence order = put order (x/0 before x/1 ...)
      rows.groupBy(_._1).foreach { case (_, rs) =>
        rs.sortBy(_._2).map(_._3).groupBy(_.split('/')(0)).foreach {
          case (key, vs) =>
            assert(vs.map(_.split('/')(1).toInt).toSeq === vs.indices.toSeq,
              s"per-key order broken for $key")
        }
      }
    } finally q.stop()
  }

  test("restart seeks each shard to its checkpointed sequence") {
    import AtLeastOnceEventModeSpec.{queues, RecordingWriter}
    import java.util.concurrent.ConcurrentLinkedQueue
    val (name, k) = fresh()
    k.createStream("s", 2)
    // find keys landing on distinct shards
    val probe = (1 to 20).map(i => s"k$i" -> k.putRecord("s", s"k$i", s"p$i")._1)
    val byShard = probe.groupBy(_._2).values.map(_.head._1).toSeq
    val (ka, kb) = (byShard(0), byShard(1))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kin_seek_").toString
    def run(sinkId: String) = {
      queues.computeIfAbsent(sinkId, _ => new ConcurrentLinkedQueue[Long])
      spark.readStream.format("graft.streaming.KinesisShapedSource")
        .option("service", name).option("stream", "s").load()
        .selectExpr("CAST(substring(value, 2) AS LONG) AS value")
        .writeStream.foreach(new RecordingWriter(sinkId))
        .option("checkpointLocation", s"$ckpt/ckpt")
        .outputMode("append").start()
    }
    val q1 = run("kin_seek_1")
    try {
      q1.processAllAvailable()
      assert(queues.get("kin_seek_1").size === 20)
    } finally q1.stop()
    // asymmetric progress while down: 2 records to one shard, 1 to the other
    k.putRecord("s", ka, "x991"); k.putRecord("s", ka, "x992")
    k.putRecord("s", kb, "x993")
    val q2 = run("kin_seek_2")
    try {
      q2.processAllAvailable()
      val got = {
        val it = queues.get("kin_seek_2").iterator
        val b = Vector.newBuilder[Long]
        while (it.hasNext) b += it.next()
        b.result().sorted
      }
      assert(got === Vector(991L, 992L, 993L), s"per-shard seek broken: $got")
    } finally {
      q2.stop()
      queues.remove("kin_seek_1"); queues.remove("kin_seek_2")
      ()
    }
  }

  test("resharding: children consumed only after the parent drains; exactly-once across the split") {
    val (name, k) = fresh()
    k.createStream("s", 1)
    val parent = k.listShards("s").head._1
    (1 to 5).foreach(i => k.putRecord("s", s"key$i", s"pre$i"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_kin_split_").toString
    val q = startQuery(name, "s", "kin_split", ckpt)
    try {
      q.processAllAvailable() // drains the parent
      k.splitShard("s", parent)
      (1 to 5).foreach(i => k.putRecord("s", s"key$i", s"post$i"))
      q.processAllAvailable() // discovers children, reads from sequence 0
      q.processAllAvailable()
      val rows = spark.table("kin_split").collect()
        .map(r => (r.getString(2), r.getString(1)))
      assert(rows.length === 10, s"exactly once across the split: ${rows.toSeq}")
      val children = k.listShards("s").filter(_._2.contains(parent)).map(_._1).toSet
      assert(children.size === 2)
      rows.foreach { case (shard, v) =>
        if (v.startsWith("pre")) assert(shard === parent, s"$v must be in the parent")
        else assert(children.contains(shard), s"$v must be in a child shard")
      }
    } finally q.stop()
  }
}
