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

  /** DDL for the progress tables (idempotent create-if-missing). */
  def ensureProgressTable(url: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        "CREATE TABLE graft_progress (" +
          "job_id VARCHAR(128) NOT NULL, part INT NOT NULL, " +
          "batch_id BIGINT NOT NULL, PRIMARY KEY (job_id, part))")
      catch { case _: java.sql.SQLException => () } // exists
      try st.executeUpdate(
        "CREATE TABLE graft_progress_meta (" +
          "job_id VARCHAR(128) NOT NULL PRIMARY KEY, parts INT NOT NULL)")
      catch { case _: java.sql.SQLException => () } // exists
      st.close()
    } finally c.close()
  }

  /** Per-partition markers are only exactly-once if a REPLAYED batch lands
    * in the same partitions — so [[writeBatch]] repartitions every batch
    * deterministically to the sink's own fixed width, and this guard makes
    * a width change across restarts (which would silently mix committed and
    * uncommitted rows within a partition) a LOUD error instead.
    */
  private def assertParts(url: String, jobId: String, parts: Int): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val q = c.prepareStatement(
        "SELECT parts FROM graft_progress_meta WHERE job_id = ?")
      q.setString(1, jobId)
      val rs = q.executeQuery()
      val existing = if (rs.next()) Some(rs.getInt(1)) else None
      rs.close(); q.close()
      existing match {
        case Some(p) if p != parts =>
          throw new IllegalStateException(
            s"JdbcTransactionalSink '$jobId' was written with $parts-way " +
              s"partitioning but its progress records $p-way: changing the " +
              "sink width across a restart breaks the per-partition " +
              "exactly-once markers. Keep the width, or use a new jobId " +
              "with a fresh output table.")
        case Some(_) => ()
        case None =>
          val ins = c.prepareStatement(
            "INSERT INTO graft_progress_meta (job_id, parts) VALUES (?, ?)")
          ins.setString(1, jobId); ins.setInt(2, parts)
          try ins.executeUpdate()
          catch { case _: java.sql.SQLException => () } // concurrent first-writer
          ins.close()
      }
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
      // Progress check inside the transaction scope. Under READ_COMMITTED
      // (Derby's default) this is NOT a stable snapshot — a zombie or
      // speculative duplicate attempt of the same (job, partition, batch)
      // can read a stale marker concurrently. The marker WRITE below is
      // therefore guarded (`batch_id < ?` predicate / PK conflict) so that
      // exactly one attempt's commit can advance the marker; the loser
      // observes update-count 0 (or a PK violation) and rolls back its data
      // rows — the JDBC analog of the Kafka-shaped sink's epoch fencing.
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
          "UPDATE graft_progress SET batch_id = ? " +
            "WHERE job_id = ? AND part = ? AND batch_id < ?")
      if (last < 0) { up.setString(1, jobId); up.setInt(2, partition); up.setLong(3, batchId) }
      else { up.setLong(1, batchId); up.setString(2, jobId); up.setInt(3, partition); up.setLong(4, batchId) }
      val advanced =
        try up.executeUpdate()
        catch {
          case _: java.sql.SQLIntegrityConstraintViolationException =>
            // A concurrent duplicate attempt inserted the marker first — its
            // data rows committed atomically with it; ours must not.
            0
        }
      up.close()
      if (advanced == 0) { c.rollback(); return } // fenced: the other attempt won
      c.commit() // data + progress atomically
    } catch {
      case e: Throwable =>
        try c.rollback() catch { case _: Throwable => () }
        throw e
    } finally c.close()
  }

  /** Write one micro-batch distributed: a transaction per sink partition.
    * The batch is REPARTITIONED here, deterministically by a hash of every
    * column into the sink's own fixed `parts` width — upstream partitioning
    * (shuffle-partition config, source splits) is NOT replay-stable, and the
    * per-partition markers are only exactly-once when a replayed batch's
    * partition contents are identical. Same row multiset → same partitions,
    * regardless of how the batch arrived.
    */
  def writeBatch(url: String, insertSql: String, jobId: String,
                 batchId: Long, batch: DataFrame, parts: Int = 8): Unit = {
    assertParts(url, jobId, parts)
    import org.apache.spark.sql.functions.col
    batch.repartition(parts, batch.columns.map(col).toIndexedSeq: _*)
      .foreachPartition { (it: Iterator[Row]) =>
        deliverPartition(url, insertSql, jobId,
          TaskContext.getPartitionId(), batchId, it)
      }
  }

  /** Exactly-once streaming JDBC sink. `jobId` must be stable across
    * restarts and pair with a checkpoint location so batch ids replay
    * deterministically (same contract as [[TransactionalSinks.files]]);
    * `parts` (the sink's fixed partition width) must also stay stable — a
    * change across restarts is detected and rejected.
    */
  def sink(url: String, insertSql: String, jobId: String,
           checkpoint: Option[String] = None, parts: Int = 8): StreamSink = {
    ensureProgressTable(url)
    StreamSinks.foreachBatch(
      (batch, id) => writeBatch(url, insertSql, jobId, id, batch, parts),
      outputMode = "append", checkpoint = checkpoint)
  }
}
