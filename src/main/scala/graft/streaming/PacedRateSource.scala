package graft.streaming

import java.util.concurrent.locks.LockSupport

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{ContinuousPartitionReader,
  ContinuousPartitionReaderFactory, ContinuousStream, Offset, PartitionOffset}
import org.apache.spark.sql.types.{LongType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A PACED continuous-mode rate source with emission-time timestamps — the
  * instrument Spark's built-in rate source cannot provide in continuous
  * mode. Measured on this box (graft.ContProbe): the built-in continuous
  * rate reader free-runs (42 M rows generated in 12 s at a configured
  * 10 k rows/s) and stamps every row with the STREAM START time, so
  * `now − timestamp` measures elapsed-since-start, not event latency — the
  * r9 latency probe's first run read a saturated 20 s at every percentile
  * because of it.
  *
  * This source implements the public DSv2 `ContinuousStream` API directly:
  * each partition's reader paces itself with nanosecond park/spin to its
  * per-partition rate and stamps each row `System.currentTimeMillis` AT
  * EMISSION, which is exactly the birth time an end-to-end latency
  * measurement needs. Values are partition-strided (partition i emits
  * i, i+P, i+2P, …) like the built-in source, so downstream shapes are
  * unchanged.
  *
  * Options: `rowsPerSecond` (total, default 1000), `numPartitions`
  * (default 2). Continuous mode only (CONTINUOUS_READ capability) — for
  * micro-batch runs use the built-in rate source, whose pacing and per-row
  * timestamps are correct there.
  */
class PacedRateSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PacedRateSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new PacedRateTable(
      Option(properties.get("rowsPerSecond")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("numPartitions")).map(_.toInt).getOrElse(2))
}

object PacedRateSource {
  val schema: StructType = new StructType()
    .add("timestamp", TimestampType).add("value", LongType)
}

private[streaming] class PacedRateTable(rowsPerSecond: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"paced_rate($rowsPerSecond/s, $numPartitions parts)"
  override def schema(): StructType = PacedRateSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.CONTINUOUS_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = PacedRateSource.schema
        override def toContinuousStream(checkpointLocation: String): ContinuousStream =
          new PacedRateContinuousStream(rowsPerSecond, numPartitions)
      }
    }
}

private[streaming] case class PacedPartitionOffset(partition: Int, count: Long)
  extends PartitionOffset

private[streaming] case class PacedOffset(counts: Seq[Long]) extends Offset {
  override def json(): String = counts.mkString("[", ",", "]")
}

private[streaming] case class PacedInputPartition(partition: Int, parts: Int,
                                                  startCount: Long,
                                                  perPartitionRate: Double)
  extends InputPartition

private[streaming] class PacedRateContinuousStream(rowsPerSecond: Long, parts: Int)
    extends ContinuousStream {

  override def initialOffset(): Offset = PacedOffset(Seq.fill(parts)(0L))

  override def deserializeOffset(json: String): Offset =
    PacedOffset(json.stripPrefix("[").stripSuffix("]").split(',')
      .filter(_.nonEmpty).map(_.toLong).toSeq)

  override def mergeOffsets(offsets: Array[PartitionOffset]): Offset = {
    val counts = Array.fill(parts)(0L)
    offsets.foreach { case PacedPartitionOffset(p, c) => counts(p) = c }
    PacedOffset(counts.toSeq)
  }

  override def planInputPartitions(start: Offset): Array[InputPartition] = {
    val counts = start.asInstanceOf[PacedOffset].counts
    (0 until parts).map(i => PacedInputPartition(i, parts,
      if (i < counts.size) counts(i) else 0L,
      rowsPerSecond.toDouble / parts): InputPartition).toArray
  }

  override def createContinuousReaderFactory(): ContinuousPartitionReaderFactory =
    new ContinuousPartitionReaderFactory {
      override def createReader(partition: InputPartition): ContinuousPartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[PacedInputPartition]
        new PacedPartitionReader(p.partition, p.parts, p.startCount, p.perPartitionRate)
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[streaming] class PacedPartitionReader(partition: Int, parts: Int,
                                              startCount: Long, perPartRate: Double)
    extends ContinuousPartitionReader[InternalRow] {
  private var count = startCount
  private val startNanos = System.nanoTime()
  private val nanosPerRow = (1e9 / perPartRate).toLong
  private var row: InternalRow = _

  override def next(): Boolean = {
    // row k (since this reader started) is due at start + k·(1/rate); park
    // until due so the emission timestamp below is the true birth time
    val due = startNanos + (count - startCount) * nanosPerRow
    var now = System.nanoTime()
    while (now < due) {
      LockSupport.parkNanos(due - now)
      if (Thread.interrupted()) { Thread.currentThread().interrupt(); return false }
      now = System.nanoTime()
    }
    val r = new GenericInternalRow(2)
    r.update(0, System.currentTimeMillis() * 1000L) // micros, stamped AT emission
    r.update(1, count * parts + partition)
    row = r
    count += 1
    true
  }

  override def get(): InternalRow = row
  override def getOffset: PartitionOffset = PacedPartitionOffset(partition, count)
  override def close(): Unit = ()
}
