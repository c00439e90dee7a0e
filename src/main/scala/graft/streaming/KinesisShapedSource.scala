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

import graft.pipeline.InMemoryKinesis

/** Kinesis-shaped streaming source — the consumer protocol of the
  * reference's Kinesis connector (extensions/kinesis/.../KinesisSources
  * .java + its shard readers) as a DSv2 `MicroBatchStream` over the
  * [[InMemoryKinesis]] stub:
  *
  *  - the checkpointed OFFSET is a per-shard sequence map (the reference
  *    snapshots shard→sequence the same way);
  *  - one reader per shard per micro-batch — per-shard order preserved,
  *    cross-shard interleaving unspecified (Kinesis' guarantee; per
  *    PARTITION KEY ordering follows because a key routes to one shard);
  *  - RESHARDING: a child shard enters the offset map (from sequence 0)
  *    only after its parent is closed AND fully covered by an
  *    already-planned (offset-log-durable) batch — the
  *    parent-before-child consumption rule the reference's shard tracker
  *    enforces, with "before" meaning a strictly earlier micro-batch;
  *  - restart seeks every shard to its checkpointed sequence.
  *
  * Options: `service` (registry name), `stream`. Columns: seq, value,
  * shard. A real deployment swaps this for a Kinesis connector against
  * the AWS endpoint (`Connectors.kinesis` passthrough) — this class
  * executes the semantics in the zero-egress sandbox, like
  * [[KafkaShapedSource]] does for Kafka.
  */
class KinesisShapedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisShapedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new KinesisShapedTable(properties.get("service"), properties.get("stream"))
}

object KinesisShapedSource {
  val schema: StructType = new StructType()
    .add("seq", LongType).add("value", StringType).add("shard", StringType)
}

private[streaming] class KinesisShapedTable(service: String, stream: String)
    extends Table with SupportsRead {
  override def name(): String = s"kinesis_shaped($service/$stream)"
  override def schema(): StructType = KinesisShapedSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KinesisShapedSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KinesisShapedStream(service, stream)
      }
    }
}

private[streaming] case class KinesisOffset(offsets: Map[String, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sorted.map { case (s, o) => s"$s:$o" }.mkString(",")
}

private[streaming] object KinesisOffset {
  def parse(json: String): KinesisOffset = {
    val t = json.trim
    if (t.isEmpty) KinesisOffset(Map.empty)
    else KinesisOffset(t.split(",").iterator.map { kv =>
      val i = kv.lastIndexOf(':')
      kv.substring(0, i) -> kv.substring(i + 1).toLong
    }.toMap)
  }
}

private[streaming] case class KinesisShardRange(service: String, stream: String,
                                                shard: String,
                                                from: Long, until: Long)
  extends InputPartition

private[streaming] class KinesisShapedStream(service: String, stream: String)
    extends MicroBatchStream {
  private def k = InMemoryKinesis.named(service)

  /** Per-shard positions some PLANNED batch's end already covers — what
    * the parent-before-child gate judges "fully drained" against. Updated
    * in planInputPartitions (by then the batch's end offsets are durable
    * in Spark's offset log, so a crash replans the same range and the
    * child's from-0 read stays exact) and on checkpoint restore
    * (deserializeOffset). NOT updated from commit(): Spark only calls
    * commit when a LATER batch starts, so gating on it would deadlock
    * discovery — the batch that would trigger commit is the one waiting
    * for the gate.
    */
  @volatile private var consumed: Map[String, Long] = Map.empty

  /** Shards eligible for the NEXT batch: every open-or-closed shard whose
    * parent (if any) is closed and drained to its end per `consumed`.
    */
  private def eligible(): Seq[String] = {
    val shards = k.listShards(stream)
    val byId = shards.map(s => s._1 -> s).toMap
    shards.collect {
      case (id, parent, _) if parent.forall { p =>
        byId.get(p).forall(ps => ps._3 &&
          consumed.getOrElse(p, 0L) >= k.endSequence(stream, p))
      } => id
    }
  }

  override def initialOffset(): Offset =
    KinesisOffset(eligible().map(_ -> 0L).toMap)

  override def deserializeOffset(json: String): Offset = {
    val o = KinesisOffset.parse(json)
    consumed = consumed ++ o.offsets
    o
  }

  override def latestOffset(): Offset = {
    // keep every shard already in the consumed view (offsets are monotone
    // and never dropped), add newly eligible shards from sequence 0
    val ids = (consumed.keySet ++ eligible()).toSeq
    KinesisOffset(ids.map(id => id -> k.endSequence(stream, id)).toMap)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[KinesisOffset].offsets
    val e = end.asInstanceOf[KinesisOffset].offsets
    consumed = consumed ++ e // durable in the offset log by now — see `consumed`
    e.toSeq.sorted.map { case (shard, until) =>
      KinesisShardRange(service, stream, shard, s.getOrElse(shard, 0L), until)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[KinesisShardRange]
        new PartitionReader[InternalRow] {
          // toArray: the returned Seq's runtime type must not make the
          // per-record loop O(n) (a List here turned the reader O(n²) —
          // measured at 10×: ~80 s/task for 300k records)
          private val records = InMemoryKinesis.named(p.service)
            .getRecords(p.stream, p.shard, p.from, p.until).toArray
          private var i = -1
          private var row: InternalRow = _
          override def next(): Boolean = {
            i += 1
            if (i >= records.length) return false
            val r = new GenericInternalRow(3)
            r.update(0, p.from + i)
            r.update(1, UTF8String.fromString(records(i)))
            r.update(2, UTF8String.fromString(p.shard))
            row = r
            true
          }
          override def get(): InternalRow = row
          override def close(): Unit = ()
        }
      }
    }
}
