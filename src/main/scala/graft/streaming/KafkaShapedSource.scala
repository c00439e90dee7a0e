package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.InMemoryTxnBroker

/** Kafka-shaped streaming SOURCE — the consumer half of the exactly-once
  * protocol the kafka-shaped sink already crash-tests. The reference's
  * `StreamKafkaP` contract (extensions/kafka `KafkaSources.java` +
  * StreamKafkaP): per-partition offsets saved to the snapshot, seek to the
  * restored offsets on restart, `read_committed` isolation so records of
  * aborted/in-flight transactions are never emitted.
  *
  * Mapped Spark-first as a DSv2 `MicroBatchStream`: the OFFSET is the
  * source-of-truth the engine checkpoints (`initialOffset` /
  * `latestOffset` / `deserializeOffset`), each micro-batch reads the
  * offset range [start, end) from the broker's read_committed log, and a
  * restart resumes from the last committed offset in the checkpoint — the
  * same seek-to-snapshot semantics, with Spark's offset log playing the
  * snapshot's role. Combined with a transactional sink this source closes
  * the exactly-once loop end to end (KafkaShapedSourceSpec drives
  * kill/restart and aborted-producer windows against the stub broker).
  *
  * The sandbox has no broker wire, so the log is an [[InMemoryTxnBroker]]
  * (commit-time append = read_committed visibility; aborted transactions
  * never enter the log). A real deployment uses Spark's own
  * `spark-sql-kafka` source with `isolation.level=read_committed`, which
  * implements exactly this contract against a real cluster — this class
  * exists to EXECUTE the semantics in the zero-egress sandbox, not to
  * replace that connector.
  *
  * Options: `broker` (registry name), `topic`.
  */
class KafkaShapedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KafkaShapedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new KafkaShapedTable(properties.get("broker"), properties.get("topic"))
}

object KafkaShapedSource {
  val schema: StructType = new StructType()
    .add("offset", LongType).add("value", StringType)
    .add("partition", IntegerType)
}

private[streaming] class KafkaShapedTable(broker: String, topic: String)
    extends Table with SupportsRead {
  override def name(): String = s"kafka_shaped($broker/$topic)"
  override def schema(): StructType = KafkaShapedSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KafkaShapedSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KafkaShapedStream(broker, topic)
      }
    }
}

/** Per-partition offset map — the shape Spark's own Kafka source
  * checkpoints ({"topic":{"0":5,"1":3}} there; partition→offset here).
  * Serialized as `p:o,p:o` sorted by partition; a bare number (the
  * pre-multi-partition format) deserializes as partition 0, so old
  * checkpoints keep restoring.
  */
private[streaming] case class KafkaLogOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1).map { case (p, o) => s"$p:$o" }.mkString(",")
}

private[streaming] object KafkaLogOffset {
  def parse(json: String): KafkaLogOffset = {
    val t = json.trim
    if (t.isEmpty) KafkaLogOffset(Map.empty)
    else if (!t.contains(':')) KafkaLogOffset(Map(0 -> t.toLong)) // legacy
    else KafkaLogOffset(t.split(",").iterator.map { kv =>
      val Array(p, o) = kv.split(":")
      p.toInt -> o.toLong
    }.toMap)
  }
}

private[streaming] case class KafkaShapedRange(broker: String, topic: String,
                                               partition: Int,
                                               from: Long, until: Long)
  extends InputPartition

/** Multi-partition micro-batch stream over the stub broker: ONE reader per
  * broker partition and per-partition offset ranges, so order is preserved
  * WITHIN a partition and unspecified across partitions — Kafka's contract,
  * and the reference's per-`KafkaConsumer`-assignment processing order
  * (StreamKafkaP polls its assigned partitions). Partition DISCOVERY:
  * `latestOffset` re-reads the broker's partition count every batch, so a
  * partition added mid-job appears in the next offset map starting at 0 —
  * the StreamKafkaP metadata-refresh behavior. An IDLE partition simply
  * keeps `from == until`; it cannot hold back event-time progress because
  * Spark's watermark is computed globally from rows that arrived (SURVEY
  * §2.8) — the reference needs explicit idle-partition exclusion
  * (EventTimeMapper.java:52-64) only because it coalesces per-partition
  * watermarks by MIN. KafkaShapedSourceSpec demonstrates both.
  */
private[streaming] class KafkaShapedStream(broker: String, topic: String)
    extends MicroBatchStream {
  private def b = InMemoryTxnBroker.named(broker)

  override def initialOffset(): Offset =
    KafkaLogOffset((0 until b.partitionsOf(topic)).map(_ -> 0L).toMap)
  override def deserializeOffset(json: String): Offset = KafkaLogOffset.parse(json)
  override def latestOffset(): Offset =
    KafkaLogOffset((0 until b.partitionsOf(topic))
      .map(p => p -> b.endOffset(topic, p)).toMap)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KafkaLogOffset].offsets
    val e = end.asInstanceOf[KafkaLogOffset].offsets
    // a partition present in `end` but absent from `start` was discovered
    // this batch: read it from 0
    e.toSeq.sortBy(_._1).map { case (p, until) =>
      KafkaShapedRange(broker, topic, p, s.getOrElse(p, 0L), until)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[KafkaShapedRange]
        new PartitionReader[InternalRow] {
          // toArray: same O(n²) guard as the kinesis reader — a List-backed
          // Seq makes records(i) a per-record walk
          private val records = InMemoryTxnBroker.named(p.broker)
            .poll(p.topic, p.partition, p.from, p.until).toArray
          private var i = -1
          private var row: InternalRow = _
          override def next(): Boolean = {
            i += 1
            if (i >= records.length) return false
            val r = new GenericInternalRow(3)
            r.update(0, p.from + i)
            r.update(1, UTF8String.fromString(records(i)))
            r.update(2, p.partition)
            row = r
            true
          }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
}
