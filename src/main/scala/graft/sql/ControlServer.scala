package graft.sql

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.{Executors, ExecutorService, TimeUnit, TimeoutException}

/** Loopback control endpoint for the operator CLI — the Spark-deployment
  * analog of the reference CLI's cluster connection (the `jet` binary's
  * lifecycle verbs run against a LIVE cluster through a client instance,
  * never a private registry — reference hazelcast-jet-all/src/main/java/com/
  * hazelcast/jet/server/JetCommandLine.java builds a HazelcastInstance per
  * invocation). Our JobRegistry and snapshot catalog are process-local, so a
  * standalone `graft suspend <job>` JVM used to see an empty registry and
  * could never manage a job started by any other process (ADVICE r17,
  * medium). A session that should be manageable from outside starts this
  * server (`graft sql --serve`); the CLI's lifecycle verbs then route their
  * statement to the live session and print the rows it returns — same
  * statements, same code path, executed where the jobs actually live.
  *
  * Protocol (UTF-8, line-based, one statement per connection): the client
  * writes the session TOKEN line, then ONE statement line; the server
  * executes it via [[GraftSql.execute]], responds with a header line and
  * zero or more `\t`-separated row lines, then a trailer `-- OK` or
  * `-- ERR <message>`, and closes the connection. Statements execute
  * serially on the owning session (lifecycle verbs are cheap; serialization
  * keeps GraftSql single-threaded) but each is bounded by a DEADLINE
  * (`graft.control.deadline.ms`, default 60 s): a statement still running at
  * the deadline gets `-- ERR statement deadline exceeded`, its worker is
  * interrupted and abandoned, and the channel accepts the next connection —
  * one slow statement cannot wedge the lifecycle channel (VERDICT r18 Next
  * #5). Streaming SELECTs are refused loudly — the control channel is for
  * lifecycle verbs, the interactive shell owns cursors.
  *
  * Trust model (VERDICT r18 Next #5 / ADVICE r18): the server binds the
  * LOOPBACK interface only and publishes `host:port` plus a per-server
  * RANDOM TOKEN in an addr file created with owner-only (0600) permissions —
  * default `${java.io.tmpdir}/graft-control-<user>.addr`, overridable via
  * the `graft.control.addr.file` sysprop or the `GRAFT_CONTROL_ADDR_FILE`
  * env var (same resolution on both ends). A connection whose first line is
  * not the token is refused before any statement parses, so only processes
  * that can READ the owner-only addr file (= the owning user) can drive the
  * session; port-scanning local users get `-- ERR unauthorized`. Starting a
  * server while another LIVE server is published at the same addr file
  * fails loudly instead of silently stealing its CLI routing, and close()
  * deletes the file only while it still carries THIS server's publication.
  */
object ControlServer {

  /** Where the endpoint address is published / looked up. */
  def resolveAddrFile: Path =
    sys.props.get("graft.control.addr.file")
      .orElse(sys.env.get("GRAFT_CONTROL_ADDR_FILE"))
      .map(Paths.get(_))
      .getOrElse(Paths.get(sys.props("java.io.tmpdir"),
        s"graft-control-${sys.props.getOrElse("user.name", "unknown")}.addr"))

  /** Per-statement wall-clock bound on the serving session. */
  private[sql] def deadlineMs: Long =
    sys.props.get("graft.control.deadline.ms").flatMap(_.toLongOption)
      .filter(_ > 0).getOrElse(60000L)

  final class Handle(val port: Int, val token: String, server: ServerSocket,
                     addrFile: Path, published: String,
                     exec: java.util.concurrent.atomic.AtomicReference[ExecutorService]) {
    def close(): Unit = {
      try server.close() catch { case _: Exception => }
      try exec.get().shutdownNow() catch { case _: Exception => }
      // delete only OUR publication: another session may have re-published
      // this addr file since (it would have refused while we were live, but
      // close ordering across JVMs is not ours to assume) — deleting theirs
      // would cut the surviving session off from the CLI (ADVICE r18)
      try {
        if (Files.exists(addrFile) &&
            new String(Files.readAllBytes(addrFile), StandardCharsets.UTF_8) == published)
          Files.delete(addrFile)
      } catch { case _: Exception => }
      ()
    }
  }

  /** Start serving `sql` on an ephemeral loopback port; publish the address
    * + token. Fails loudly if a LIVE server is already published at
    * `addrFile` (a stale publication — nothing listening — is cleaned up
    * and replaced).
    */
  def start(sql: GraftSql, addrFile: Path = resolveAddrFile): Handle = {
    if (Files.exists(addrFile)) {
      val prior = new String(Files.readAllBytes(addrFile), StandardCharsets.UTF_8)
      if (isLive(prior))
        throw new IllegalStateException(
          s"a live graft control server is already published at $addrFile " +
            s"(${prior.linesIterator.nextOption().getOrElse("")}) — stop it, or " +
            "point graft.control.addr.file elsewhere for a second served session")
      Files.deleteIfExists(addrFile)
    }
    val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    val token = {
      val b = new Array[Byte](16)
      new java.security.SecureRandom().nextBytes(b)
      b.map("%02x".format(_)).mkString
    }
    val addr = s"${InetAddress.getLoopbackAddress.getHostAddress}:${server.getLocalPort}"
    val published = s"$addr\n$token\n"
    writeOwnerOnly(addrFile, published)
    val exec = new java.util.concurrent.atomic.AtomicReference[ExecutorService](
      Executors.newSingleThreadExecutor(runnable => {
        val t = new Thread(runnable, "graft-control-exec")
        t.setDaemon(true)
        t
      }))
    val t = new Thread(() => serveLoop(sql, server, token, exec), "graft-control-server")
    t.setDaemon(true)
    t.start()
    new Handle(server.getLocalPort, token, server, addrFile, published, exec)
  }

  /** Owner-only (0600) publication — the token doubles as the capability,
    * so the file must not be world-readable in shared tmpdirs (ADVICE r18,
    * medium). Non-POSIX filesystems fall back to the default-permission
    * write (the JVM's File permissions API has no finer handle there).
    */
  private def writeOwnerOnly(path: Path, content: String): Unit = {
    try {
      import java.nio.file.attribute.PosixFilePermissions
      val attrs = PosixFilePermissions.asFileAttribute(
        PosixFilePermissions.fromString("rw-------"))
      Files.deleteIfExists(path)
      Files.createFile(path, attrs)
    } catch { case _: UnsupportedOperationException => }
    Files.write(path, content.getBytes(StandardCharsets.UTF_8))
    ()
  }

  /** Does anything answer at a published `host:port\n...` content? */
  private def isLive(published: String): Boolean =
    published.linesIterator.nextOption().map(_.trim.split(":", 2)) match {
      case Some(Array(h, p)) if p.nonEmpty && p.forall(_.isDigit) =>
        try {
          val s = new Socket()
          try { s.connect(new java.net.InetSocketAddress(h, p.toInt), 500); true }
          finally s.close()
        } catch { case _: Exception => false }
      case _ => false
    }

  private def serveLoop(sql: GraftSql, server: ServerSocket, token: String,
                        exec: java.util.concurrent.atomic.AtomicReference[ExecutorService]): Unit = {
    while (!server.isClosed) {
      val conn =
        try server.accept()
        catch { case _: Exception => return } // closed
      try handle(sql, conn, token, exec)
      catch { case _: Exception => }
      finally { try conn.close() catch { case _: Exception => } }
    }
  }

  private def handle(sql: GraftSql, conn: Socket, token: String,
                     exec: java.util.concurrent.atomic.AtomicReference[ExecutorService]): Unit = {
    conn.setSoTimeout(120000)
    val in = new BufferedReader(
      new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new java.io.OutputStreamWriter(conn.getOutputStream, StandardCharsets.UTF_8))
    val presented = in.readLine()
    if (presented == null ||
        !java.security.MessageDigest.isEqual(
          presented.trim.getBytes(StandardCharsets.UTF_8),
          token.getBytes(StandardCharsets.UTF_8))) {
      out.println("-- ERR unauthorized (control token mismatch — read the " +
        "addr file published by the serving session)")
      out.flush()
      return
    }
    val stmt = in.readLine()
    if (stmt != null && stmt.trim.nonEmpty) {
      // buffer the response OFF the socket: the statement runs under the
      // deadline on the serial worker, and a timed-out worker must not be
      // left holding this connection's stream
      val task = new java.util.concurrent.Callable[Seq[String]] {
        def call(): Seq[String] = {
          val df = sql.execute(stmt)
          if (df.isStreaming)
            Seq("-- ERR streaming SELECT is not supported over the " +
              "control channel — run it in the owning sql shell")
          else {
            val rows = df.take(1000).map { r =>
              r.toSeq.map {
                case null => "NULL"
                case a: Array[_] => a.mkString("[", ",", "]")
                case s: Seq[_] => s.mkString("[", ",", "]")
                case other => other.toString
              }.mkString("\t")
            }.toSeq
            (df.columns.mkString("\t") +: rows) :+ "-- OK"
          }
        }
      }
      val lines =
        try {
          val fut = exec.get().submit(task)
          try fut.get(deadlineMs, TimeUnit.MILLISECONDS)
          catch {
            case _: TimeoutException =>
              // interrupt + abandon the stuck worker and install a fresh one
              // so the NEXT statement is not queued behind it — the channel
              // stays deadline-bounded, the slow statement keeps running (or
              // dies to the interrupt) in the owning session
              fut.cancel(true)
              val stale = exec.getAndSet(
                Executors.newSingleThreadExecutor(runnable => {
                  val t = new Thread(runnable, "graft-control-exec")
                  t.setDaemon(true)
                  t
                }))
              stale.shutdownNow()
              Seq(s"-- ERR statement deadline (${deadlineMs} ms) exceeded — " +
                "the statement was abandoned; the control channel stays live")
            case e: java.util.concurrent.ExecutionException =>
              val cause = Option(e.getCause).getOrElse(e)
              Seq("-- ERR " + Option(cause.getMessage).getOrElse(cause.toString)
                .replaceAll("[\r\n]+", " "))
          }
        } catch {
          case e: Exception =>
            Seq("-- ERR " +
              Option(e.getMessage).getOrElse(e.toString).replaceAll("[\r\n]+", " "))
        }
      lines.foreach(out.println)
    }
    out.flush()
  }
}

/** Client side of the control protocol — used by the CLI's lifecycle verbs. */
object ControlClient {

  /** Route a statement to a published live endpoint.
    * None    → no endpoint published (caller should execute in-process);
    * Some(Right(lines)) → executed remotely, rows to print;
    * Some(Left(error))  → the endpoint answered with an error.
    * A STALE addr file (endpoint gone) is treated as no endpoint — the file
    * is removed so later invocations skip the connect attempt.
    */
  def route(stmt: String,
            addrFile: Path = ControlServer.resolveAddrFile): Option[Either[String, Seq[String]]] = {
    if (!Files.exists(addrFile)) return None
    val published = new String(Files.readAllBytes(addrFile), StandardCharsets.UTF_8)
    val lines0 = published.linesIterator.toSeq
    val addr = lines0.headOption.getOrElse("").trim
    // second line = the session token (absent in a stale pre-token file —
    // send the empty string; the server refuses and the caller surfaces it)
    val token = lines0.drop(1).headOption.getOrElse("").trim
    val (host, port) = addr.split(":", 2) match {
      case Array(h, p) if p.nonEmpty && p.forall(_.isDigit) => (h, p.toInt)
      case _ => return None
    }
    val conn =
      try {
        val s = new Socket()
        s.connect(new java.net.InetSocketAddress(host, port), 2000)
        s
      } catch {
        case _: Exception =>
          // stale publication: the serving session is gone
          try Files.deleteIfExists(addrFile) catch { case _: Exception => }
          return None
      }
    try {
      conn.setSoTimeout(120000)
      val out = new PrintWriter(
        new java.io.OutputStreamWriter(conn.getOutputStream, StandardCharsets.UTF_8))
      out.println(token)
      out.println(stmt.replaceAll("[\r\n]+", " "))
      out.flush()
      val in = new BufferedReader(
        new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
      val lines = Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
      lines.find(_.startsWith("-- ERR")) match {
        case Some(e) => Some(Left(e.stripPrefix("-- ERR").trim))
        case None => Some(Right(lines.filterNot(_ == "-- OK")))
      }
    } catch {
      case e: Exception =>
        Some(Left(s"control endpoint at $addr failed: ${e.getMessage}"))
    } finally conn.close()
  }
}
