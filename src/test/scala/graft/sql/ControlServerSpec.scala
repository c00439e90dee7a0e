package graft.sql

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

/** The control endpoint's trust model + deadline (VERDICT r18 Next #5 /
  * ADVICE r18): token-mismatch refusal, owner-only addr file, live-server
  * overwrite refusal, publication-checked delete on close, and the
  * per-statement deadline under a concurrent client — one slow statement
  * must not wedge the lifecycle channel past the deadline.
  */
class ControlServerSpec extends SparkSpec {

  private def withServer[A](f: (GraftSql, ControlServer.Handle, java.nio.file.Path) => A): A = {
    val addrFile = Files.createTempFile("graft_ctlspec_", ".addr")
    Files.delete(addrFile)
    val sql = GraftSql(spark)
    val server = ControlServer.start(sql, addrFile)
    try f(sql, server, addrFile)
    finally {
      server.close()
      Files.deleteIfExists(addrFile)
      ()
    }
  }

  /** Raw protocol drive (the client side without ControlClient's sugar). */
  private def rawExchange(port: Int, token: String, stmt: String): Seq[String] = {
    val s = new Socket()
    s.connect(new java.net.InetSocketAddress("127.0.0.1", port), 2000)
    try {
      s.setSoTimeout(30000)
      val out = new PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8))
      out.println(token)
      out.println(stmt)
      out.flush()
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
    } finally s.close()
  }

  test("addr file is owner-only and carries addr + token; the token gates execution") {
    withServer { (_, server, addrFile) =>
      val lines = new String(Files.readAllBytes(addrFile), StandardCharsets.UTF_8)
        .linesIterator.toSeq
      assert(lines.size >= 2 && lines(1).trim == server.token)
      // owner-only publication (POSIX fs): the token IS the capability
      val perms = Files.getPosixFilePermissions(addrFile)
      import java.nio.file.attribute.PosixFilePermission._
      assert(!perms.contains(GROUP_READ) && !perms.contains(OTHERS_READ),
        s"addr file must be 0600, got $perms")

      val ok = ControlClient.route("SHOW JOBS", addrFile)
      assert(ok.exists(_.isRight), s"token-bearing client refused: $ok")

      val bad = rawExchange(server.port, "not-the-token", "SHOW JOBS")
      assert(bad.exists(_.contains("unauthorized")), bad.toString)
      // and a mismatched token must never have executed the statement —
      // the refusal is the ONLY line
      assert(bad.forall(_.startsWith("-- ERR")), bad.toString)
    }
  }

  test("a slow statement hits the deadline; a concurrent client still gets through") {
    val prev = sys.props.get("graft.control.deadline.ms")
    System.setProperty("graft.control.deadline.ms", "1500")
    try withServer { (_, server, addrFile) =>
      spark.udf.register("ctl_slow_fn", (x: Long) => { Thread.sleep(20000); x })
      // client A: the wedging statement (runs on the serial worker until the
      // deadline abandons it)
      val a = new java.util.concurrent.CompletableFuture[Seq[String]]()
      val tA = new Thread(() =>
        try a.complete(rawExchange(server.port, server.token,
          "SELECT ctl_slow_fn(1) AS x"))
        catch { case e: Exception => a.completeExceptionally(e) })
      tA.start()
      Thread.sleep(300) // let A's statement reach the worker
      // client B: must complete within A's deadline + its own execution,
      // not behind A's full 20 s sleep
      val t0 = System.nanoTime()
      val b = ControlClient.route("SHOW JOBS", addrFile)
      val bSecs = (System.nanoTime() - t0) / 1e9
      assert(b.exists(_.isRight), s"concurrent client failed: $b")
      assert(bSecs < 15.0, f"lifecycle channel wedged $bSecs%.1f s behind a slow statement")
      val aLines = a.get(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(aLines.exists(_.contains("deadline")), aLines.toString)
      tA.join(5000)
    } finally {
      prev match {
        case Some(v) => System.setProperty("graft.control.deadline.ms", v)
        case None => System.clearProperty("graft.control.deadline.ms")
      }
    }
  }

  test("starting over a LIVE publication fails loudly; a stale one is replaced") {
    withServer { (sql, _, addrFile) =>
      val e = intercept[IllegalStateException](ControlServer.start(sql, addrFile))
      assert(e.getMessage.contains("already published"), e.getMessage)
    }
    // stale: an addr file whose endpoint is dead gets cleaned up and replaced
    val addrFile = Files.createTempFile("graft_ctlspec_stale_", ".addr")
    Files.write(addrFile, "127.0.0.1:1\ndeadtoken\n".getBytes(StandardCharsets.UTF_8))
    val server = ControlServer.start(GraftSql(spark), addrFile)
    try {
      val content = new String(Files.readAllBytes(addrFile), StandardCharsets.UTF_8)
      assert(content.contains(s":${server.port}") && content.contains(server.token))
    } finally { server.close(); Files.deleteIfExists(addrFile); () }
  }

  test("close deletes only its own publication") {
    val addrFile = Files.createTempFile("graft_ctlspec_close_", ".addr")
    Files.delete(addrFile)
    val sql = GraftSql(spark)
    val server = ControlServer.start(sql, addrFile)
    // another session re-published (simulated: overwrite the file) — close
    // must NOT delete the survivor's publication
    Files.write(addrFile, "127.0.0.1:2\nsurvivortoken\n".getBytes(StandardCharsets.UTF_8))
    server.close()
    try {
      assert(Files.exists(addrFile), "close deleted another session's publication")
      val content = new String(Files.readAllBytes(addrFile), StandardCharsets.UTF_8)
      assert(content.contains("survivortoken"))
    } finally { Files.deleteIfExists(addrFile); () }
  }
}
