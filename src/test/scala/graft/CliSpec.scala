package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}

/** Drives every `graft` CLI subcommand headlessly (VERDICT r16 task 2):
  * submit (argv construction + injected runner), the job lifecycle verbs
  * against a real streaming job, snapshot save/delete, and the SQL shell —
  * both `-e` one-shots and a piped-stdin interactive session, including a
  * streaming SELECT served through the cursor.
  */
class CliSpec extends SparkSpec {

  @volatile private var lastSubmit: Seq[String] = Nil

  /** Assert a job reaches RUNNING (short poll: start is synchronous but a
    * heavily loaded suite JVM can briefly lag registration), failing with the
    * query's own exception when it instead died — the bare boolean told us
    * nothing when this flaked under full-suite load.
    */
  private def assertRunning(name: String, clue: String): Unit = {
    val deadline = System.currentTimeMillis + 15000
    while (System.currentTimeMillis < deadline &&
      !graft.pipeline.JobRegistry.get(name).exists(_.isRunning)) Thread.sleep(50)
    val h = graft.pipeline.JobRegistry.get(name)
    assert(h.exists(_.isRunning),
      s"$clue — job $name status=${h.map(_.status)} " +
        s"exception=${h.flatMap(_.query.exception).map(_.getMessage)}")
  }

  private def cli(args: String*)(stdin: String = ""): (Int, String, String) = {
    val out = new ByteArrayOutputStream
    val err = new ByteArrayOutputStream
    val rc = Cli.run(args.toArray, () => spark,
      new ByteArrayInputStream(stdin.getBytes("UTF-8")),
      new PrintStream(out, true, "UTF-8"), new PrintStream(err, true, "UTF-8"),
      argv => { lastSubmit = argv; 0 })
    (rc, out.toString("UTF-8"), err.toString("UTF-8"))
  }

  test("help prints usage; unknown command is a usage error") {
    val (rc, out, _) = cli("help")()
    assert(rc == 0 && out.contains("save-snapshot") && out.contains("submit"))
    val (rc2, _, err2) = cli("frobnicate")()
    assert(rc2 == 1 && err2.contains("unknown"))
  }

  test("submit: --dry-run prints the spark-submit argv; runner is invoked otherwise") {
    val (rc, out, _) = cli("submit", "--class", "graft.DeploySmoke",
      "--master", "local[2]", "--conf", "spark.executor.memory=1g",
      "--dry-run", "/tmp/app.jar", "argA", "argB")()
    assert(rc == 0)
    val argv = out.trim.split("\n").toSeq
    assert(argv.head.endsWith("/bin/spark-submit"))
    assert(argv.containsSlice(Seq("--class", "graft.DeploySmoke")))
    assert(argv.containsSlice(Seq("--master", "local[2]")))
    assert(argv.containsSlice(Seq("--conf", "spark.executor.memory=1g")))
    assert(argv.takeRight(3) == Seq("/tmp/app.jar", "argA", "argB"))

    val (rc2, _, _) = cli("submit", "--class", "x.Y", "/tmp/app.jar")()
    assert(rc2 == 0)
    assert(lastSubmit.containsSlice(Seq("--class", "x.Y")) &&
      lastSubmit.last == "/tmp/app.jar")

    val (rc3, _, err3) = cli("submit", "--class", "x.Y")()
    assert(rc3 == 1 && err3.contains("jar"))
  }

  test("sql -e: batch statement prints a fixed-width page") {
    val (rc, out, _) = cli("sql", "-e", "SELECT 1 AS one, 'ab' AS s")()
    assert(rc == 0)
    assert(out.contains("one") && out.contains("ab") && out.contains("(1 row(s))"))
  }

  test("sql -e: statement errors report and return nonzero") {
    val (rc, _, err) = cli("sql", "-e", "SELECT definitely_not_a_column FROM nowhere")()
    assert(rc == 2 && err.contains("graft:"))
  }

  test("job lifecycle: create via shell, list/suspend/resume/save-snapshot/cancel") {
    graft.pipeline.KeyedStore.drop("cli_store")
    val create =
      """CREATE JOB cli_j OPTIONS('snapshotIntervalMillis'='100') AS
        |SINK INTO cli_store(k)
        |SELECT v % 10 AS k, count(*) AS n
        |FROM TABLE(GENERATE_STREAM(500)) WHERE v < 200 GROUP BY v % 10""".stripMargin
    val (rcC, outC, errC) = cli("sql", "-e", create)()
    assert(rcC == 0, s"create failed: $errC")
    assert(outC.contains("job cli_j started"))

    val (rcL, outL, _) = cli("list-jobs")()
    assert(rcL == 0 && outL.contains("cli_j"))

    val (rcS, outS, _) = cli("suspend", "cli_j")()
    assert(rcS == 0 && outS.contains("suspended"))
    assert(!graft.pipeline.JobRegistry.get("cli_j").exists(_.isRunning))

    val (rcR, outR, _) = cli("resume", "cli_j")()
    assert(rcR == 0 && outR.contains("resumed"))
    assertRunning("cli_j", "after resume")

    // save-snapshot WITHOUT --cancel: snapshot exists and the job is running
    val (rcSnap, outSnap, errSnap) = cli("save-snapshot", "cli_j", "cli_snap")()
    assert(rcSnap == 0, s"save-snapshot failed: $errSnap")
    assert(outSnap.contains("exported") && outSnap.contains("resumed"))
    assertRunning("cli_j",
      "Jet parity: save-snapshot keeps the job running unless --cancel")
    val (rcLS, outLS, _) = cli("list-snapshots")()
    assert(rcLS == 0 && outLS.contains("cli_snap"))

    val (rcD, outD, _) = cli("delete-snapshot", "cli_snap")()
    assert(rcD == 0 && outD.contains("dropped"))

    val (rcX, outX, _) = cli("cancel", "cli_j")()
    assert(rcX == 0 && outX.contains("dropped"))
    assert(graft.pipeline.JobRegistry.get("cli_j").isEmpty)
    graft.pipeline.KeyedStore.drop("cli_store")
  }

  test("save-snapshot --cancel drops the job after export (jet save-snapshot -C)") {
    graft.pipeline.KeyedStore.drop("cli_store2")
    val create =
      """CREATE JOB cli_j2 AS SINK INTO cli_store2(k)
        |SELECT v AS k, count(*) AS n
        |FROM TABLE(GENERATE_STREAM(200)) WHERE v < 100 GROUP BY v""".stripMargin
    assert(cli("sql", "-e", create)()._1 == 0)
    val (rc, out, _) = cli("save-snapshot", "--cancel", "cli_j2", "cli_snap2")()
    assert(rc == 0 && out.contains("exported"))
    assert(graft.pipeline.JobRegistry.get("cli_j2").isEmpty, "--cancel drops the job")
    assert(cli("delete-snapshot", "cli_snap2")()._1 == 0)
    graft.pipeline.KeyedStore.drop("cli_store2")
  }

  test("invalid job names are rejected before reaching the SQL parser") {
    val (rc, _, err) = cli("suspend", "no;such")()
    assert(rc == 1 && err.contains("invalid name"))
  }

  test("cluster prints master and executor info") {
    val (rc, out, _) = cli("cluster")()
    assert(rc == 0 && out.contains("master: local[4]") && out.contains("executors:"))
  }

  test("piped shell session: multi-line statement, help, streaming SELECT, exit") {
    val session =
      """help
        |SELECT 2 + 2
        |  AS four;
        |SELECT * FROM TABLE(GENERATE_STREAM(500));
        |exit
        |""".stripMargin
    val (rc, out, _) = cli("sql", "--max-rows", "5")(session)
    assert(rc == 0)
    assert(out.contains("save-snapshot"), "help inside the shell prints usage")
    assert(out.contains("four") && out.contains("(1 row(s))"),
      "multi-line batch statement executes at the ';'")
    assert(out.contains("(5 streamed row(s))"),
      "streaming SELECT serves bounded rows through the cursor")
  }

  test("splitStatements is quote-aware") {
    val s = "CREATE MAPPING m TYPE csv OPTIONS('path'='/a;b'); SELECT 1"
    val parts = Cli.splitStatements(s)
    assert(parts.size == 2 && parts.head.contains("/a;b"))
  }

  test("sql --max-rows rejects non-numeric values as a usage error (no stack trace)") {
    val (rc, _, err) = cli("sql", "--max-rows", "abc", "-e", "SELECT 1")()
    assert(rc == 1 && err.contains("--max-rows needs a positive integer"),
      s"got rc=$rc err=$err")
  }

  test("submit: a valued option as the last token is a usage error, not the jar") {
    // pre-r18, `graft submit --class` treated the literal string "--class"
    // as the jar positional (ADVICE r17)
    val (rc, _, err) = cli("submit", "--class")()
    assert(rc == 1 && err.contains("--class needs a value"), s"rc=$rc err=$err")
    val (rc2, _, err2) = cli("submit", "--conf")()
    assert(rc2 == 1 && err2.contains("--conf needs a value"), s"rc=$rc2 err=$err2")
  }

  test("submit: --driver-memory passes through (bash/Scala whitelist parity)") {
    val (rc, out, _) = cli("submit", "--driver-memory", "2g", "--dry-run",
      "/tmp/app.jar")()
    assert(rc == 0)
    val argv = out.trim.split("\n").toSeq
    assert(argv.containsSlice(Seq("--driver-memory", "2g")), argv.toString)
  }

  test("lifecycle verbs route to a live session's control endpoint (graft sql --serve)") {
    // The ADVICE r17 medium finding: JobRegistry is process-local, so a
    // standalone `graft suspend <job>` JVM saw an empty registry. With a
    // served session publishing its control endpoint, the verbs manage the
    // OWNING session's jobs. Here: the "live session" is this suite's spark;
    // the "standalone CLI" is a Cli.run whose sparkF THROWS — proving every
    // verb ran remotely, never in-process.
    val addrFile = java.nio.file.Files.createTempFile("graft_ctl_", ".addr")
    java.nio.file.Files.delete(addrFile)
    System.setProperty("graft.control.addr.file", addrFile.toString)
    val sql = graft.sql.GraftSql(spark)
    val server = graft.sql.ControlServer.start(sql)
    try {
      graft.pipeline.KeyedStore.drop("ctl_store")
      sql.execute(
        """CREATE JOB ctl_j AS SINK INTO ctl_store(k)
          |SELECT v AS k, count(*) AS n
          |FROM TABLE(GENERATE_STREAM(200)) WHERE v < 100 GROUP BY v""".stripMargin)
      assertRunning("ctl_j", "control-endpoint fixture job")

      def remoteCli(args: String*): (Int, String, String) = {
        val out = new ByteArrayOutputStream
        val err = new ByteArrayOutputStream
        val rc = Cli.run(args.toArray,
          () => fail("lifecycle verb started an in-process session instead " +
            "of routing to the live endpoint"),
          new ByteArrayInputStream(Array.empty[Byte]),
          new PrintStream(out, true, "UTF-8"),
          new PrintStream(err, true, "UTF-8"), argv => 0)
        (rc, out.toString("UTF-8"), err.toString("UTF-8"))
      }

      val (rcL, outL, errL) = remoteCli("list-jobs")
      assert(rcL == 0 && outL.contains("ctl_j"), s"out=$outL err=$errL")
      val (rcS, outS, _) = remoteCli("suspend", "ctl_j")
      assert(rcS == 0 && outS.contains("suspended"))
      assert(!graft.pipeline.JobRegistry.get("ctl_j").exists(_.isRunning),
        "the LIVE session's job must be the one suspended")
      val (rcR, outR, _) = remoteCli("resume", "ctl_j")
      assert(rcR == 0 && outR.contains("resumed"))
      assertRunning("ctl_j", "after remote resume")
      // save-snapshot routes its statement SEQUENCE remotely too
      val (rcSnap, outSnap, _) = remoteCli("save-snapshot", "ctl_j", "ctl_snap")
      assert(rcSnap == 0 && outSnap.contains("exported") &&
        outSnap.contains("resumed"), outSnap)
      assert(remoteCli("delete-snapshot", "ctl_snap")._1 == 0)
      val (rcX, outX, _) = remoteCli("cancel", "ctl_j")
      assert(rcX == 0 && outX.contains("dropped"))
      assert(graft.pipeline.JobRegistry.get("ctl_j").isEmpty)

      // errors come back over the wire as errors, not silent OKs
      val (rcE, _, errE) = remoteCli("delete-snapshot", "no_such_snapshot")
      assert(rcE == 0 || rcE == 2) // GraftSql reports not-found as a status row
      assert(errE.isEmpty || errE.contains("graft:"))
    } finally {
      server.close()
      System.clearProperty("graft.control.addr.file")
      graft.pipeline.KeyedStore.drop("ctl_store")
    }
  }

  test("a stale control addr file falls back to in-process execution") {
    val addrFile = java.nio.file.Files.createTempFile("graft_ctl_stale_", ".addr")
    // a dead endpoint: nothing listens on this port
    java.nio.file.Files.write(addrFile, "127.0.0.1:1".getBytes("UTF-8"))
    System.setProperty("graft.control.addr.file", addrFile.toString)
    try {
      val (rc, out, _) = cli("list-jobs")()
      assert(rc == 0 && out.contains("name"), s"fallback failed: $out")
      assert(!java.nio.file.Files.exists(addrFile),
        "stale addr file should be cleaned up on the failed connect")
    } finally System.clearProperty("graft.control.addr.file")
  }
}
