package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** 2PC transactional sink protocol (TransactionalSinks): exactly-once under
  * the two failure windows the reference's TwoPhaseSnapshotCommitUtility
  * handles — replay of a committed transaction, and crash between prepare
  * and commit.
  */
class TransactionalSinkSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def visibleRows(outDir: String): Seq[Long] = {
    val dirs = new java.io.File(outDir).listFiles()
    if (dirs == null) Seq.empty
    else {
      val dataDirs = dirs.filter(d => d.isDirectory && !d.getName.startsWith("_"))
      if (dataDirs.isEmpty) Seq.empty
      else spark.read.parquet(dataDirs.map(_.getPath).toSeq: _*)
        .collect().map(_.getLong(0)).toSeq.sorted
    }
  }

  test("streaming 2PC file sink delivers each batch exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val (out, staging) = (tmp("txn_out_"), tmp("txn_stg_"))
    val mem = MemoryStream[Long]
    val job = TransactionalSinks.files(out, staging, jobId = "txnjob")
      .start(mem.toDF)
    mem.addData(1L, 2L)
    job.processAllAvailable()
    mem.addData(3L)
    job.processAllAvailable()
    assert(visibleRows(out) === Seq(1L, 2L, 3L))
    job.cancel()
  }

  test("replayed committed batch is skipped; prepare-crash then replay stays exactly-once") {
    val (out, staging) = (tmp("txn_out2_"), tmp("txn_stg2_"))
    val batch0 = Seq(10L, 11L).toDF("v")

    // normal delivery
    TransactionalSinks.applyBatch(out, staging, "j", 0L, batch0)
    assert(visibleRows(out) === Seq(10L, 11L))
    // foreachBatch redelivers batch 0 after a restart → must be a no-op
    TransactionalSinks.applyBatch(out, staging, "j", 0L, batch0)
    assert(visibleRows(out) === Seq(10L, 11L))

    // crash window: batch 1 prepared (staged, invisible) but never committed
    val batch1 = Seq(20L).toDF("v")
    TransactionalSinks.prepare(out, staging, "j", 1L, batch1)
    assert(visibleRows(out) === Seq(10L, 11L), "prepared batch must be invisible")
    // recovery replays the in-flight batch: prepare overwrites, commit publishes
    TransactionalSinks.applyBatch(out, staging, "j", 1L, batch1)
    assert(visibleRows(out) === Seq(10L, 11L, 20L))
    // ... and a second replay after the commit is again a no-op
    TransactionalSinks.applyBatch(out, staging, "j", 1L, batch1)
    assert(visibleRows(out) === Seq(10L, 11L, 20L))
  }

  test("abort drops a prepared transaction without touching published data") {
    val (out, staging) = (tmp("txn_out3_"), tmp("txn_stg3_"))
    TransactionalSinks.applyBatch(out, staging, "j", 0L, Seq(1L).toDF("v"))
    TransactionalSinks.prepare(out, staging, "j", 1L, Seq(2L).toDF("v"))
    TransactionalSinks.abort(staging, "j", 1L)
    assert(!Files.exists(java.nio.file.Paths.get(staging, "j-1")))
    assert(visibleRows(out) === Seq(1L))
  }
}
