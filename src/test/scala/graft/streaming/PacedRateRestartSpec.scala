package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the restart contract of the paced source's plain micro-batch
  * admission path: `latestOffset` derives counts from wall-clock since
  * CONSTRUCTION, so after a restart from an existing checkpoint the raw
  * formula would sit below the restored start offset and the engine would
  * commit a smaller end offset — re-emitting already-delivered values.
  * The stream must clamp admission to every offset it has seen restored
  * (deserializeOffset) or produced (mergeOffsets).
  */
class PacedRateRestartSpec extends AnyFunSuite {

  private def counts(o: org.apache.spark.sql.connector.read.streaming.Offset): Seq[Long] =
    o.asInstanceOf[PacedOffset].counts

  test("latestOffset never regresses below a checkpoint-restored offset") {
    val stream = new PacedRateRealTimeStream(rowsPerSecond = 10, parts = 2)
    // simulate restart: the engine restores the committed offset from the
    // checkpoint log via deserializeOffset before planning the next batch
    val restored = stream.deserializeOffset("[5000,4000]")
    assert(counts(restored) === Seq(5000L, 4000L))
    // freshly constructed → wall-clock admission is ~0; without the clamp
    // this would be [0,0], below the restored start
    val latest = counts(stream.latestOffset())
    assert(latest(0) >= 5000L && latest(1) >= 4000L,
      s"admitted offset $latest regressed below the restored [5000,4000]")
  }

  test("latestOffset also honors reader progress reported via mergeOffsets") {
    val stream = new PacedRateRealTimeStream(rowsPerSecond = 10, parts = 2)
    stream.mergeOffsets(Array(PacedPartitionOffset(0, 900L), PacedPartitionOffset(1, 700L)))
    val latest = counts(stream.latestOffset())
    assert(latest(0) >= 900L && latest(1) >= 700L)
  }

  test("a fresh stream still admits on the wall-clock schedule (floor is zero)") {
    val stream = new PacedRateRealTimeStream(rowsPerSecond = 1000000, parts = 1)
    Thread.sleep(20)
    assert(counts(stream.latestOffset()).head > 0L, "wall-clock admission intact")
  }
}
