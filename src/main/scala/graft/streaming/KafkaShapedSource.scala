package graft.streaming

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
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

private[streaming] case class KafkaLogOffset(offset: Long) extends Offset {
  override def json(): String = offset.toString
}

private[streaming] case class KafkaShapedRange(broker: String, topic: String,
                                               from: Long, until: Long)
  extends InputPartition

private[streaming] class KafkaShapedStream(broker: String, topic: String)
    extends MicroBatchStream {
  override def initialOffset(): Offset = KafkaLogOffset(0L)
  override def deserializeOffset(json: String): Offset =
    KafkaLogOffset(json.trim.toLong)
  override def latestOffset(): Offset =
    KafkaLogOffset(InMemoryTxnBroker.named(broker).endOffset(topic))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(KafkaShapedRange(broker, topic,
      start.asInstanceOf[KafkaLogOffset].offset,
      end.asInstanceOf[KafkaLogOffset].offset))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[KafkaShapedRange]
        new PartitionReader[InternalRow] {
          private val records =
            InMemoryTxnBroker.named(p.broker).poll(p.topic, p.from, p.until)
          private var i = -1
          private var row: InternalRow = _
          override def next(): Boolean = {
            i += 1
            if (i >= records.size) return false
            val r = new GenericInternalRow(2)
            r.update(0, p.from + i)
            r.update(1, UTF8String.fromString(records(i)))
            row = r
            true
          }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
}
