package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once JDBC sink against a REAL database (embedded Derby): the
  * progress marker commits in the same local transaction as the data, so
  * every crash/replay window resolves to exactly-once — executable proof of
  * the §2.15 JDBC-XA row.
  */
class JdbcTransactionalSinkSpec extends SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_txn_jdbc;create=true"
  private val insertSql = "INSERT INTO sink_rows (v) VALUES (?)"

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { val st = c.createStatement(); st.executeUpdate(sql); st.close() }
    catch { case _: java.sql.SQLException => () } finally c.close()
  }

  private def visible(): Seq[Long] = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT v FROM sink_rows")
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (rs.next()) out += rs.getLong(1)
      out.toSeq.sorted
    } finally c.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    exec("CREATE TABLE sink_rows (v BIGINT)")
    JdbcTransactionalSink.ensureProgressTable(url)
  }

  test("streaming sink delivers each micro-batch's rows exactly once") {
    implicit val sqlCtx = spark.sqlContext
    exec("DELETE FROM sink_rows"); exec("DELETE FROM graft_progress")
    val mem = MemoryStream[Long]
    val job = JdbcTransactionalSink.sink(url, insertSql, "ejob").start(mem.toDF)
    mem.addData(1L, 2L)
    job.processAllAvailable()
    mem.addData(3L)
    job.processAllAvailable()
    job.cancel()
    assert(visible() == Seq(1L, 2L, 3L))
  }

  test("replayed committed batch skips whole; partial failure rolls back to nothing") {
    exec("DELETE FROM sink_rows"); exec("DELETE FROM graft_progress")
    val batch = Seq(10L, 11L).toDF("v")
    JdbcTransactionalSink.writeBatch(url, insertSql, "rjob", 0L, batch)
    assert(visible() == Seq(10L, 11L))
    // foreachBatch redelivers batch 0 after restart → atomic skip, no dups
    JdbcTransactionalSink.writeBatch(url, insertSql, "rjob", 0L, batch)
    assert(visible() == Seq(10L, 11L))
    // crash mid-batch: the iterator throws after the first row was added —
    // the transaction must roll back, leaving NOTHING of batch 1 visible
    val boom = new RuntimeException("mid-batch crash")
    intercept[RuntimeException] {
      JdbcTransactionalSink.deliverPartition(url, insertSql, "rjob", 0, 1L,
        Iterator(org.apache.spark.sql.Row(20L)) ++ { throw boom })
    }
    assert(visible() == Seq(10L, 11L), "rolled-back rows must be invisible")
    // recovery replays batch 1 cleanly → exactly-once
    JdbcTransactionalSink.deliverPartition(url, insertSql, "rjob", 0, 1L,
      Iterator(org.apache.spark.sql.Row(20L)))
    assert(visible() == Seq(10L, 11L, 20L))
    // and a second replay of the now-committed batch is a no-op
    JdbcTransactionalSink.deliverPartition(url, insertSql, "rjob", 0, 1L,
      Iterator(org.apache.spark.sql.Row(20L)))
    assert(visible() == Seq(10L, 11L, 20L))
  }

  test("a zombie duplicate attempt is fenced: only one attempt's rows commit") {
    import org.apache.spark.sql.Row
    exec("DELETE FROM sink_rows"); exec("DELETE FROM graft_progress")
    // --- UPDATE path: marker exists at batch 0; two concurrent attempts of
    // batch 1. Attempt A reads the stale marker (0), then mid-iteration the
    // duplicate attempt B delivers the SAME batch and commits first. A's
    // guarded UPDATE (`batch_id < 1`) matches nothing → A rolls back.
    JdbcTransactionalSink.deliverPartition(url, insertSql, "zjob", 0, 0L,
      Iterator(Row(1L)))
    val rowsA = Iterator(Row(30L)) ++ {
      JdbcTransactionalSink.deliverPartition(url, insertSql, "zjob", 0, 1L,
        Iterator(Row(31L)))
      Iterator(Row(32L))
    }
    JdbcTransactionalSink.deliverPartition(url, insertSql, "zjob", 0, 1L, rowsA)
    assert(visible() == Seq(1L, 31L),
      "exactly one of the duplicate attempts may commit batch 1's rows")
    // --- INSERT path: no marker yet for partition 1; the duplicate commits
    // first, so A's marker INSERT hits the PK and A rolls back its rows.
    val rowsFirst = Iterator(Row(40L)) ++ {
      JdbcTransactionalSink.deliverPartition(url, insertSql, "zjob", 1, 0L,
        Iterator(Row(41L)))
      Iterator(Row(42L))
    }
    JdbcTransactionalSink.deliverPartition(url, insertSql, "zjob", 1, 0L, rowsFirst)
    assert(visible() == Seq(1L, 31L, 41L),
      "PK-fenced first-write race must also commit exactly one attempt")
  }

  test("a sink-width change across restarts is rejected loudly") {
    exec("DELETE FROM sums") // unrelated table; just ensure db is up
    exec("DELETE FROM graft_progress"); exec("DELETE FROM graft_progress_meta")
    val batch = Seq(1L).toDF("v")
    JdbcTransactionalSink.writeBatch(url, insertSql, "wjob", 0L, batch, parts = 4)
    val e = intercept[IllegalStateException] {
      JdbcTransactionalSink.writeBatch(url, insertSql, "wjob", 1L, batch, parts = 8)
    }
    assert(e.getMessage.contains("partition"))
    // same width continues fine
    JdbcTransactionalSink.writeBatch(url, insertSql, "wjob", 1L, batch, parts = 4)
  }

  test("partitions track progress independently (per-processor id scheme)") {
    exec("DELETE FROM sink_rows"); exec("DELETE FROM graft_progress")
    JdbcTransactionalSink.deliverPartition(url, insertSql, "pjob", 0, 0L,
      Iterator(org.apache.spark.sql.Row(1L)))
    // partition 1 crashes before its delivery of batch 0; its replay must
    // run even though partition 0's marker already says batch 0
    JdbcTransactionalSink.deliverPartition(url, insertSql, "pjob", 1, 0L,
      Iterator(org.apache.spark.sql.Row(2L)))
    assert(visible() == Seq(1L, 2L))
    // partition 0's replay of batch 0 still skips
    JdbcTransactionalSink.deliverPartition(url, insertSql, "pjob", 0, 0L,
      Iterator(org.apache.spark.sql.Row(1L)))
    assert(visible() == Seq(1L, 2L))
  }
}
