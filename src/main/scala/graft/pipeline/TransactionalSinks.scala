package graft.pipeline

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Two-phase-commit sink seam — the reference's transactional-sink protocol
  * (TwoPhaseSnapshotCommitUtility.java, ~700 LoC of snapshot-aligned
  * prepare/commit bookkeeping) re-expressed over Spark's micro-batch model,
  * where the micro-batch id IS the snapshot id:
  *
  *   - PREPARE (phase 1, snapshot): stage the batch durably but invisibly,
  *     keyed by transaction id (jobId, batchId). Idempotent overwrite — a
  *     replayed prepare after a crash simply re-stages.
  *   - COMMIT (phase 2, snapshot-complete): atomically publish the staged
  *     data (same-filesystem directory rename) and mark the transaction id
  *     committed. Idempotent — if the publish already happened but the mark
  *     was lost, the mark is repaired without re-writing.
  *   - On restart, foreachBatch re-delivers the in-flight batch: a committed
  *     transaction id short-circuits (exactly-once), an uncommitted one
  *     re-runs prepare+commit — exactly the reference's "commit transactions
  *     ≤ restored snapshot, roll back the rest" recovery rule, with the roll
  *     back implicit in the overwrite.
  *
  * This is the seam a Kafka/JMS/XA transactional sink plugs into (swap the
  * stage/publish steps for producer.beginTransaction/commitTransaction); the
  * sandbox has no broker, so the file implementation is the executable proof
  * of the protocol. Scale: prepare is a distributed write (executors), only
  * the rename + marker touch the driver — O(1) per batch regardless of size.
  */
object TransactionalSinks {

  private def txnId(jobId: String, batchId: Long) = s"$jobId-$batchId"

  private def commitMarker(outDir: String, txn: String) =
    Paths.get(outDir, "_graft_commits", txn)

  /** Has this transaction already been made visible? */
  def committed(outDir: String, jobId: String, batchId: Long): Boolean =
    Files.exists(commitMarker(outDir, txnId(jobId, batchId)))

  /** Phase 1: stage the batch under a transaction directory — durable,
    * invisible to readers of `outDir`, idempotent (overwrite).
    */
  def prepare(outDir: String, stagingDir: String, jobId: String, batchId: Long,
              batch: DataFrame, format: String = "parquet"): Unit = {
    val staging = s"$stagingDir/${txnId(jobId, batchId)}"
    batch.write.mode("overwrite").format(format).save(staging)
  }

  /** Phase 2: atomically publish the staged transaction and mark it
    * committed. Safe to call again after any partial failure:
    * already-published → repair the marker only; already-marked → no-op.
    */
  def commit(outDir: String, stagingDir: String, jobId: String, batchId: Long): Unit = {
    val txn = txnId(jobId, batchId)
    val target = Paths.get(outDir, txn)
    val staging = Paths.get(stagingDir, txn)
    if (!Files.exists(target)) {
      Files.createDirectories(Paths.get(outDir))
      Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
    }
    val marker = commitMarker(outDir, txn)
    Files.createDirectories(marker.getParent)
    if (!Files.exists(marker)) Files.createFile(marker)
    ()
  }

  /** Roll back a prepared-but-uncommitted transaction (reference
    * `rollbackTransaction`): drop the staged data. Replays would overwrite it
    * anyway — this is the eager cleanup path.
    */
  def abort(stagingDir: String, jobId: String, batchId: Long): Unit = {
    val staging = Paths.get(stagingDir, txnId(jobId, batchId))
    if (Files.exists(staging))
      Files.walk(staging)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
  }

  /** One delivered micro-batch through the full protocol. */
  def applyBatch(outDir: String, stagingDir: String, jobId: String, batchId: Long,
                 batch: DataFrame, format: String = "parquet"): Unit =
    if (!committed(outDir, jobId, batchId)) {
      prepare(outDir, stagingDir, jobId, batchId, batch, format)
      commit(outDir, stagingDir, jobId, batchId)
    }

  /** Exactly-once transactional file sink: 2PC per micro-batch. `jobId` must
    * be stable across restarts (it keys the transaction ids the recovery rule
    * dedups on); pair it with a checkpoint location on the query so batch ids
    * replay deterministically.
    */
  def files(outDir: String, stagingDir: String, jobId: String,
            checkpoint: Option[String] = None,
            format: String = "parquet"): StreamSink =
    StreamSinks.foreachBatch(
      (batch, id) => applyBatch(outDir, stagingDir, jobId, id, batch, format),
      outputMode = "append", checkpoint = checkpoint)
}
