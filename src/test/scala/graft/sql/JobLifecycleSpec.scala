package graft.sql

import graft.SparkSpec
import graft.pipeline.{JobRegistry, KeyedStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Job lifecycle parity (SURVEY §2.13/§2.15 — SqlCreateJob.java, SqlAlterJob
  * .java, Job.suspend/resume): CREATE JOB starts a named checkpointed stream;
  * SUSPEND stops it; RESUME restarts the same statement from the checkpoint so
  * source offsets continue (no reprocessing, no loss).
  */
class JobLifecycleSpec extends SparkSpec {

  import spark.implicits._

  test("CREATE JOB / SUSPEND / RESUME continues from checkpoint") {
    implicit val sqlCtx = spark.sqlContext
    val sql = GraftSql(spark)
    val mem = MemoryStream[(Long, String)]
    mem.toDF.toDF("id", "v").createOrReplaceTempView("job_src")

    mem.addData((1L, "a"), (2L, "b"))
    sql.execute("CREATE JOB j1 AS SINK INTO job_out(id) SELECT id, v FROM job_src")
    JobRegistry.get("j1").get.processAllAvailable()
    assert(KeyedStore.get(spark, "job_out").count() === 2)

    sql.execute("ALTER JOB j1 SUSPEND")
    assert(!JobRegistry.get("j1").get.isRunning)
    // rows arriving while suspended must be picked up on resume
    mem.addData((3L, "c"))

    sql.execute("ALTER JOB j1 RESUME")
    val h = JobRegistry.get("j1").get
    assert(h.isRunning)
    h.processAllAvailable()
    val out = KeyedStore.get(spark, "job_out").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a", 2L -> "b", 3L -> "c"))

    sql.execute("DROP JOB j1")
    assert(JobRegistry.get("j1").isEmpty)
  }

  test("CREATE SNAPSHOT exports the checkpoint; job resumes after; DROP removes it") {
    implicit val sqlCtx = spark.sqlContext
    val sql = GraftSql(spark)
    val mem = MemoryStream[(Long, String)]
    mem.toDF.toDF("id", "v").createOrReplaceTempView("snap_src")

    mem.addData((1L, "a"))
    sql.execute("CREATE JOB j2 AS SINK INTO snap_out(id) SELECT id, v FROM snap_src")
    JobRegistry.get("j2").get.processAllAvailable()

    sql.execute("CREATE SNAPSHOT s1 FOR JOB j2")
    val snapDir = GraftSql.snapshots.get("s1")
    assert(snapDir != null, "snapshot not registered")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(snapDir, "offsets")),
      "snapshot missing offset log")
    assert(!JobRegistry.get("j2").get.isRunning) // snapshot quiesced the job

    // the live job resumes from its own (uncopied) checkpoint
    mem.addData((2L, "b"))
    sql.execute("ALTER JOB j2 RESUME")
    JobRegistry.get("j2").get.processAllAvailable()
    assert(KeyedStore.get(spark, "snap_out").count() === 2)

    sql.execute("DROP SNAPSHOT s1")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(snapDir)))
    sql.execute("DROP JOB j2")
  }

  test("CREATE JOB OPTIONS initialSnapshotName starts a NEW job from exported state") {
    // Jet JobConfig.setInitialSnapshotName (JobConfig.java, SqlCreateJob
    // .java:180): a fresh job seeded with an exported snapshot's state +
    // offsets — it must NOT reprocess rows the snapshot already covers.
    implicit val sqlCtx = spark.sqlContext
    val sql = GraftSql(spark)
    val mem = MemoryStream[(Long, String)]
    mem.toDF.toDF("id", "v").createOrReplaceTempView("init_src")

    mem.addData((1L, "a"), (2L, "b"))
    sql.execute("CREATE JOB j3 AS SINK INTO init_out(id) SELECT id, v FROM init_src")
    JobRegistry.get("j3").get.processAllAvailable()
    sql.execute("CREATE SNAPSHOT s2 FOR JOB j3") // quiesces j3
    sql.execute("DROP JOB j3")

    // wipe the store: if the new job cold-started it would re-emit ids 1,2
    KeyedStore.drop("init_out")
    mem.addData((3L, "c"))
    sql.execute("CREATE JOB j4 OPTIONS ('initialSnapshotName'='s2') " +
      "AS SINK INTO init_out(id) SELECT id, v FROM init_src")
    JobRegistry.get("j4").get.processAllAvailable()
    val out = KeyedStore.get(spark, "init_out").as[(Long, String)].collect().toMap
    assert(out === Map(3L -> "c"),
      s"expected only post-snapshot rows, got $out — snapshot offsets not honored")

    sql.execute("DROP JOB j4")
    sql.execute("DROP SNAPSHOT s2")
    KeyedStore.drop("init_out")
  }

  test("CREATE JOB IF NOT EXISTS is a no-op on an existing job (keeps checkpoint)") {
    implicit val sqlCtx = spark.sqlContext
    val sql = GraftSql(spark)
    val mem = MemoryStream[(Long, String)]
    mem.toDF.toDF("id", "v").createOrReplaceTempView("ine_src")
    mem.addData((1L, "a"))
    sql.execute("CREATE JOB j5 AS SINK INTO ine_out(id) SELECT id, v FROM ine_src")
    val ckpt = GraftSql.jobSpecs.get("j5").checkpoint
    val handle = JobRegistry.get("j5").get
    val msg = sql.execute(
      "CREATE JOB IF NOT EXISTS j5 AS SINK INTO ine_out(id) SELECT id, v FROM ine_src")
      .collect().head.getString(0)
    assert(msg.contains("already exists"))
    assert(GraftSql.jobSpecs.get("j5").checkpoint === ckpt, "checkpoint was replaced")
    assert(JobRegistry.get("j5").get eq handle, "running job was replaced")
    sql.execute("DROP JOB j5")
    KeyedStore.drop("ine_out")
  }

  test("CREATE JOB rejects unknown options; accepts the JobConfig set") {
    val sql = GraftSql(spark)
    val err = intercept[IllegalArgumentException] {
      sql.execute("CREATE JOB jx OPTIONS ('bogusOption'='1') " +
        "AS SINK INTO x_out(v) SELECT v FROM TABLE(GENERATE_STREAM(10))")
    }
    assert(err.getMessage.contains("bogusOption"))
    // snapshotIntervalMillis → trigger cadence; processingGuarantee accepted
    sql.execute("CREATE JOB jy OPTIONS ('processingGuarantee'='exactlyOnce', " +
      "'snapshotIntervalMillis'='50') AS SINK INTO y_out(v) " +
      "SELECT v FROM TABLE(GENERATE_STREAM(100))")
    val h = JobRegistry.get("jy").get
    assert(h.isRunning)
    assert(GraftSql.jobSpecs.get("jy").triggerMs === Some(50L))
    sql.execute("DROP JOB jy")
    KeyedStore.drop("y_out")
  }

  test("CREATE JOB over TABLE(GENERATE_STREAM) runs end-to-end; DROP JOB stops it") {
    // the canonical Jet demo statement (StreamGeneratorTableFunction.java):
    // an unbounded rate stream sunk into a store as a named job
    val sql = GraftSql(spark)
    sql.execute(
      "CREATE JOB gen_job AS SINK INTO gen_out(v) SELECT v FROM TABLE(GENERATE_STREAM(100))")
    val h = JobRegistry.get("gen_job").get
    assert(h.isRunning)
    val jobs = sql.execute("SHOW JOBS").collect().map(r => (r.getString(0), r.getBoolean(1)))
    assert(jobs.contains(("gen_job", true)))
    // rows keep arriving: wait until the store holds data from ≥2 micro-batches
    val deadline = System.currentTimeMillis() + 30000
    var n = 0L
    while (n < 20 && System.currentTimeMillis() < deadline) {
      h.processAllAvailable()
      n = if (KeyedStore.exists("gen_out")) KeyedStore.get(spark, "gen_out").count() else 0L
    }
    assert(n >= 20, s"rate-stream job only produced $n rows")
    sql.execute("DROP JOB gen_job")
    assert(JobRegistry.get("gen_job").isEmpty)
    assert(!h.isRunning)
    KeyedStore.drop("gen_out")
  }

  test("Job.getMetrics: cumulative rows + late-event drops; SHOW JOB METRICS") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF.toDF("ts", "v").withWatermark("ts", "1 second")
      .groupBy(window($"ts", "1 minute")).agg(sum($"v"))
    val q = df.writeStream.format("memory").queryName("metrics_job")
      .outputMode("update").start()
    val h = JobRegistry.register(new graft.pipeline.JobHandle("metrics_job", q))
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    try {
      mem.addData((t(1000), 1.0), (t(2000), 2.0)) // watermark → 1999s
      q.processAllAvailable()
      mem.addData((t(10), 5.0)) // far behind the watermark → dropped late
      q.processAllAvailable()
      mem.addData((t(2001), 1.0))
      q.processAllAvailable()
      val m = h.metrics
      assert(m.getOrElse("numInputRows", 0.0) >= 4.0, s"metrics: $m")
      assert(m.getOrElse("lateEventsDropped", 0.0) >= 1.0, s"metrics: $m")
      assert(m.getOrElse("batches", 0.0) >= 2.0, s"metrics: $m")
      assert(m.getOrElse("totalBatchDurationMs", 0.0) > 0.0, s"metrics: $m")
      // the SQL surface returns the same counters as (metric, value) rows
      val rows = GraftSql(spark).execute("SHOW JOB METRICS metrics_job")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(rows.getOrElse("numInputRows", 0.0) >= 4.0)
      assert(rows.getOrElse("lateEventsDropped", 0.0) >= 1.0)
    } finally {
      q.stop()
      JobRegistry.drop("metrics_job")
      ()
    }
  }
}
