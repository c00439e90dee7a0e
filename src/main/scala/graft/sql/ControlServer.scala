package graft.sql

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

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
  * writes ONE statement line; the server executes it via
  * [[GraftSql.execute]], responds with a header line and zero or more
  * `\t`-separated row lines, then a trailer `-- OK` or `-- ERR <message>`,
  * and closes the connection. Statements execute serially on the owning
  * session (lifecycle verbs are cheap; serialization keeps GraftSql
  * single-threaded). Streaming SELECTs are refused loudly — the control
  * channel is for lifecycle verbs, the interactive shell owns cursors.
  *
  * The server binds the LOOPBACK interface only and publishes `host:port`
  * in an addr file — default `${java.io.tmpdir}/graft-control-<user>.addr`,
  * overridable via the `graft.control.addr.file` sysprop or the
  * `GRAFT_CONTROL_ADDR_FILE` env var (same resolution on both ends, so the
  * serving shell and a later CLI invocation agree without configuration).
  */
object ControlServer {

  /** Where the endpoint address is published / looked up. */
  def resolveAddrFile: Path =
    sys.props.get("graft.control.addr.file")
      .orElse(sys.env.get("GRAFT_CONTROL_ADDR_FILE"))
      .map(Paths.get(_))
      .getOrElse(Paths.get(sys.props("java.io.tmpdir"),
        s"graft-control-${sys.props.getOrElse("user.name", "unknown")}.addr"))

  final class Handle(val port: Int, server: ServerSocket, addrFile: Path) {
    def close(): Unit = {
      try server.close() catch { case _: Exception => }
      Files.deleteIfExists(addrFile)
      ()
    }
  }

  /** Start serving `sql` on an ephemeral loopback port; publish the address. */
  def start(sql: GraftSql, addrFile: Path = resolveAddrFile): Handle = {
    val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
    val addr = s"${InetAddress.getLoopbackAddress.getHostAddress}:${server.getLocalPort}"
    Files.write(addrFile, addr.getBytes(StandardCharsets.UTF_8))
    val t = new Thread(() => serveLoop(sql, server), "graft-control-server")
    t.setDaemon(true)
    t.start()
    new Handle(server.getLocalPort, server, addrFile)
  }

  private def serveLoop(sql: GraftSql, server: ServerSocket): Unit = {
    while (!server.isClosed) {
      val conn =
        try server.accept()
        catch { case _: Exception => return } // closed
      try handle(sql, conn)
      catch { case _: Exception => }
      finally { try conn.close() catch { case _: Exception => } }
    }
  }

  private def handle(sql: GraftSql, conn: Socket): Unit = {
    conn.setSoTimeout(120000)
    val in = new BufferedReader(
      new InputStreamReader(conn.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(
      new java.io.OutputStreamWriter(conn.getOutputStream, StandardCharsets.UTF_8))
    val stmt = in.readLine()
    if (stmt != null && stmt.trim.nonEmpty) {
      try {
        val df = sql.execute(stmt)
        if (df.isStreaming)
          out.println("-- ERR streaming SELECT is not supported over the " +
            "control channel — run it in the owning sql shell")
        else {
          out.println(df.columns.mkString("\t"))
          df.take(1000).foreach { r =>
            out.println(r.toSeq.map {
              case null => "NULL"
              case a: Array[_] => a.mkString("[", ",", "]")
              case s: Seq[_] => s.mkString("[", ",", "]")
              case other => other.toString
            }.mkString("\t"))
          }
          out.println("-- OK")
        }
      } catch {
        case e: Exception =>
          out.println("-- ERR " +
            Option(e.getMessage).getOrElse(e.toString).replaceAll("[\r\n]+", " "))
      }
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
    val addr = new String(Files.readAllBytes(addrFile), StandardCharsets.UTF_8).trim
    val (host, port) = addr.split(":", 2) match {
      case Array(h, p) if p.forall(_.isDigit) => (h, p.toInt)
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
