package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Fault-tolerance parity (SURVEY §2.15, §5.4 — the reference's
  * JobRestartWithSnapshotTest / *_failoverTest family): stop a stateful
  * streaming job mid-stream and restart it from its checkpoint. The restarted
  * query must (a) restore per-key state — running sums continue, not reset —
  * and (b) not re-emit already-committed results (exactly-once file sink by
  * manifest; Jet gets the same via aligned snapshots + two-phase sinks).
  */
class CheckpointRestartSpec extends SparkSpec {

  import spark.implicits._

  test("stateful query restarts from checkpoint with state and no duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ckpt_").toString
    val out = s"$dir/out"
    val ckpt = s"$dir/checkpoint"

    val mem = MemoryStream[(String, Long)]

    def runningSum(src: MemoryStream[(String, Long)]) =
      StatefulOps.rollingAggregate[String, (String, Long), Long, (String, Long)](
        src.toDS(), _._1, zero = 0L,
        accumulate = (acc, v) => acc + v._2,
        export = (k, acc) => (k, acc)).toDF("k", "running")

    // run 1: two batches, then stop (simulated failure/suspend)
    mem.addData(("a", 1L), ("b", 10L))
    val job1 = StreamSinks.files(out, ckpt).start(runningSum(mem))
    job1.processAllAvailable()
    mem.addData(("a", 2L))
    job1.processAllAvailable()
    job1.cancel()

    // run 2: restart the same logical job from the checkpoint (Jet
    // suspend→resume, Job.java:39); new data continues the restored state
    mem.addData(("a", 4L), ("b", 5L))
    val job2 = StreamSinks.files(out, ckpt).start(runningSum(mem))
    job2.processAllAvailable()
    job2.cancel()

    val rows = spark.read.parquet(out).as[(String, Long)].collect().toSeq
    // exactly one output per input event, none duplicated across the restart
    assert(rows.size === 5, s"expected 5 outputs, got: $rows")
    // state restored: a continues 1→3→7 (not 1→3→4), b continues 10→15
    assert(rows.filter(_._1 == "a").map(_._2).sorted === Seq(1L, 3L, 7L))
    assert(rows.filter(_._1 == "b").map(_._2).sorted === Seq(10L, 15L))
  }
}
