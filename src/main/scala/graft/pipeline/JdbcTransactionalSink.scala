package graft.pipeline

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}

/** Exactly-once transactional JDBC sink — the reference's XA-grade JDBC
  * guarantee (SURVEY §2.15; Jet wires `Sinks.jdbc` through
  * `XaSinkProcessorBase.java` so the INSERTs and the snapshot commit are one
  * atomic unit) re-expressed with the standard micro-batch idiom that needs
  * no XA coordinator: the data rows AND a per-(job, partition) progress
  * marker commit in the SAME local database transaction, so progress is
  * atomic with data — the JDBC analog of [[KafkaShapedSink]]'s
  * progress-record-in-transaction and of Kafka's sendOffsetsToTransaction.
  *
  * Protocol per delivered micro-batch, per sink partition:
  *   1. open a connection, autocommit OFF;
  *   2. read the progress row (job_id, partition) — if its batch_id ≥ the
  *      delivered batch, the whole partition REPLAY short-circuits (its rows
  *      committed atomically with that marker: exactly-once);
  *   3. INSERT the partition's rows, UPSERT the progress row, COMMIT;
  *   4. any failure before commit → rollback: nothing visible, the
  *      checkpoint replays the batch, step 2 decides idempotently.
  *
  * Unlike a Kafka broker, a real JDBC database exists in this sandbox
  * (Derby), so this path is EXECUTABLE end-to-end — the spec drives
  * crash/replay windows against real transactions, closing the §2.15
  * JDBC-XA row with code rather than documentation.
  *
  * Scale: one connection + one progress-row round-trip per partition per
  * batch; rows stream through addBatch/executeBatch. The progress table is
  * (job, partition)-keyed — no global coordinator, the same
  * id-per-processor scheme as the reference's per-processor XA resources.
  */
object JdbcTransactionalSink {

  /** DDL for the progress table (idempotent create-if-missing). */
  def ensureProgressTable(url: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        "CREATE TABLE graft_progress (" +
          "job_id VARCHAR(128) NOT NULL, part INT NOT NULL, " +
          "batch_id BIGINT NOT NULL, PRIMARY KEY (job_id, part))")
      catch { case _: java.sql.SQLException => () } // exists
      st.close()
    } finally c.close()
  }

  /** One partition's rows through one local transaction. `insertSql` must be
    * a parameterized INSERT matching the row schema positionally.
    */
  def deliverPartition(url: String, insertSql: String, jobId: String,
                       partition: Int, batchId: Long,
                       rows: Iterator[Row]): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      c.setAutoCommit(false)
      // progress check INSIDE the transaction scope (reads its own snapshot)
      val q = c.prepareStatement(
        "SELECT batch_id FROM graft_progress WHERE job_id = ? AND part = ?")
      q.setString(1, jobId); q.setInt(2, partition)
      val rs = q.executeQuery()
      val last = if (rs.next()) rs.getLong(1) else -1L
      rs.close(); q.close()
      if (last >= batchId) { c.rollback(); return } // replayed: atomic skip
      val ins = c.prepareStatement(insertSql)
      var n = 0
      rows.foreach { r =>
        var i = 0
        while (i < r.length) { ins.setObject(i + 1, r.get(i)); i += 1 }
        ins.addBatch()
        n += 1
        if (n % 1000 == 0) { ins.executeBatch(); () }
      }
      ins.executeBatch(); ins.close()
      val up =
        if (last < 0) c.prepareStatement(
          "INSERT INTO graft_progress (job_id, part, batch_id) VALUES (?, ?, ?)")
        else c.prepareStatement(
          "UPDATE graft_progress SET batch_id = ? WHERE job_id = ? AND part = ?")
      if (last < 0) { up.setString(1, jobId); up.setInt(2, partition); up.setLong(3, batchId) }
      else { up.setLong(1, batchId); up.setString(2, jobId); up.setInt(3, partition) }
      up.executeUpdate(); up.close()
      c.commit() // data + progress atomically
    } catch {
      case e: Throwable =>
        try c.rollback() catch { case _: Throwable => () }
        throw e
    } finally c.close()
  }

  /** Write one micro-batch distributed: a transaction per sink partition. */
  def writeBatch(url: String, insertSql: String, jobId: String,
                 batchId: Long, batch: DataFrame): Unit =
    batch.foreachPartition { (it: Iterator[Row]) =>
      deliverPartition(url, insertSql, jobId,
        TaskContext.getPartitionId(), batchId, it)
    }

  /** Exactly-once streaming JDBC sink. `jobId` must be stable across
    * restarts and pair with a checkpoint location so batch ids replay
    * deterministically (same contract as [[TransactionalSinks.files]]).
    */
  def sink(url: String, insertSql: String, jobId: String,
           checkpoint: Option[String] = None): StreamSink = {
    ensureProgressTable(url)
    StreamSinks.foreachBatch(
      (batch, id) => writeBatch(url, insertSql, jobId, id, batch),
      outputMode = "append", checkpoint = checkpoint)
  }
}
