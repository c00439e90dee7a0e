package graft.pipeline

import graft.SparkSpec
import java.nio.file.Files

/** The full fault-tolerance story on real components, end to end — the
  * reference's "snapshot + transactional sink = exactly-once" claim
  * (SURVEY §2.15) executed, not asserted: a file journal source (offsets
  * checkpointed) feeds a keyed stateful op (fMGWS state in the state store)
  * into the transactional JDBC sink (progress atomic with data in Derby);
  * the job is killed mid-stream and restarted from its checkpoint. Every
  * layer must recover: source offsets (no reprocessing), operator state
  * (running sums continue), sink (no duplicate rows).
  */
class ExactlyOnceE2ESpec extends SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_e2e;create=true"

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { val st = c.createStatement(); st.executeUpdate(sql); st.close() }
    catch { case _: java.sql.SQLException => () } finally c.close()
  }

  private def dbRows(): Seq[(String, Long)] = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c.createStatement().executeQuery("SELECT k, running FROM sums")
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (rs.next()) out += ((rs.getString(1), rs.getLong(2)))
      out.toSeq.sortBy(r => (r._1, r._2))
    } finally c.close()
  }

  test("journal source -> stateful op -> transactional JDBC sink survives a crash exactly-once") {
    exec("CREATE TABLE sums (k VARCHAR(16), running BIGINT)")
    exec("DELETE FROM sums"); exec("DELETE FROM graft_progress")
    JdbcTransactionalSink.ensureProgressTable(url)
    val dir = Files.createTempDirectory("graft_e2e_").toString
    val (in, ckpt) = (s"$dir/in", s"$dir/ckpt")

    def startJob() = {
      val src = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("k STRING, v BIGINT"))
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[(String, Long)]
      val summed = StatefulOps.rollingAggregate[String, (String, Long), Long, (String, Long)](
        src, _._1, zero = 0L,
        accumulate = (acc, v) => acc + v._2,
        export = (k, acc) => (k, acc)).toDF("k", "running")
      JdbcTransactionalSink.sink(url,
        "INSERT INTO sums (k, running) VALUES (?, ?)", "e2e",
        checkpoint = Some(ckpt)).start(summed)
    }

    // epoch 1: two files land, then the job "crashes"
    Seq(("a", 1L), ("b", 10L)).toDF("k", "v").write.mode("append").parquet(in)
    val job1 = startJob()
    job1.processAllAvailable()
    Seq(("a", 2L)).toDF("k", "v").write.mode("append").parquet(in)
    job1.processAllAvailable()
    job1.cancel()
    assert(dbRows() == Seq(("a", 1L), ("a", 3L), ("b", 10L)), s"pre-crash: ${dbRows()}")

    // epoch 2: restart from the checkpoint; a new file continues the state
    Seq(("a", 4L), ("b", 5L)).toDF("k", "v").write.mode("append").parquet(in)
    val job2 = startJob()
    job2.processAllAvailable()
    job2.cancel()

    // source did not replay files 1-2 (no duplicate sums), state restored
    // (a: 3 -> 7, not 4; b: 10 -> 15), sink wrote each output exactly once
    assert(dbRows() == Seq(("a", 1L), ("a", 3L), ("a", 7L), ("b", 10L), ("b", 15L)),
      s"post-restart: ${dbRows()}")
  }
}
