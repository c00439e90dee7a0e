package graft

import java.io.{BufferedReader, InputStream, InputStreamReader, PrintStream}

import graft.sql.GraftSql
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Operator command line + interactive SQL shell — the reference's `jet`
  * binary (hazelcast-jet-all/src/main/java/com/hazelcast/jet/server/
  * JetCommandLine.java:117-500: submit / suspend / resume / restart / cancel
  * / save-snapshot / delete-snapshot / list-jobs / list-snapshots / cluster,
  * plus an interactive SQL console; shipped as the `jet` bin script in
  * hazelcast-jet-distribution/src/bin-filemode-755), re-expressed for the
  * Spark deployment model:
  *
  *   - `submit` wraps spark-submit — the Spark analog of `jet submit`'s
  *     upload-and-run (a Spark cluster's job intake IS spark-submit; the
  *     CLI adds Jet's flag surface and jar/class defaulting);
  *   - the job-lifecycle verbs route to the SAME GraftSql statements a SQL
  *     client uses (`ALTER JOB x SUSPEND`, `CREATE SNAPSHOT s FOR JOB x`, …)
  *     against the session's JobRegistry — one code path, two surfaces;
  *   - `sql` is an interactive stdin shell over [[GraftSql.execute]]:
  *     statements end with `;`, batch results print as one page, streaming
  *     SELECTs are served through the bounded [[GraftSql.StreamCursor]]
  *     (Jet's infinite `SqlResult` iterator semantics — rows print as the
  *     stream produces them, bounded by --max-rows per statement).
  *
  * Headlessly testable: [[run]] takes the session, stdio, and a submit
  * runner as parameters (CliSpec drives every subcommand plus a piped shell
  * session); [[main]] wires the real ones. `scripts/graft` is the bin
  * entrypoint (used by scripts/deploy_smoke.sh mode 3).
  */
object Cli {

  private val usage =
    """usage: graft <command> [options]
      |
      |commands:
      |  submit [--class C] [--master M] [--name N] [--driver-memory M]
      |         [--conf k=v]... [--dry-run] <jar> [args...]
      |      run a packaged job via spark-submit (--dry-run prints the argv)
      |  sql [-e "stmt[; stmt...]"] [--max-rows N] [--serve]
      |      interactive SQL shell on stdin (statements end with ';'),
      |      or execute -e statements and exit; --serve publishes a
      |      loopback control endpoint so the lifecycle verbs below can
      |      manage THIS session's jobs from a separate process
      |      (without a served session, those verbs act in-process only)
      |  list-jobs                      show registered jobs and their state
      |  list-snapshots                 show exported snapshots
      |  suspend <job>                  stop the job, keep its checkpoint
      |  resume <job>                   restart the job from its checkpoint
      |  restart <job>                  alias of resume (Jet: restart)
      |  cancel <job>                   stop and deregister the job
      |  save-snapshot [--cancel] <job> <name>
      |      export the job's state as a named snapshot; the job resumes
      |      afterwards unless --cancel is given (Jet: save-snapshot -C)
      |  delete-snapshot <name>         drop an exported snapshot
      |  cluster                        show master / app / executor info
      |  help                           this text
      |""".stripMargin

  /** Entry point used by `scripts/graft` (via spark-submit --class graft.Cli). */
  def main(args: Array[String]): Unit = {
    val rc = run(args, () => defaultSession(), System.in, System.out, System.err,
      realSubmit)
    if (rc != 0) sys.exit(rc)
  }

  /** Session for a CLI invocation: under spark-submit the master arrives in
    * the Spark conf; standalone JVMs fall back to GRAFT_MASTER or local[4].
    */
  private def defaultSession(): SparkSession = {
    val b = SparkSession.builder()
    if (!sys.props.contains("spark.master"))
      b.master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
    val spark = GraftSession.tune(b.appName("graft-cli"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def realSubmit(argv: Seq[String]): Int =
    scala.sys.process.Process(argv).!

  /** Dispatch a CLI invocation. `sparkF` is invoked lazily — `submit`,
    * `help`, and usage errors never start a session.
    */
  def run(args: Array[String], sparkF: () => SparkSession,
          in: InputStream, out: PrintStream, err: PrintStream,
          submitRunner: Seq[String] => Int): Int = {
    args.toList match {
      case Nil | ("help" | "--help" | "-h") :: _ => out.println(usage); 0
      case "submit" :: rest => submit(rest, out, err, submitRunner)
      case "sql" :: rest => sqlCommand(rest, sparkF, in, out, err)
      case "list-jobs" :: Nil => statement(sparkF, out, err, "SHOW JOBS")
      case "list-snapshots" :: Nil => statement(sparkF, out, err, "SHOW SNAPSHOTS")
      case "suspend" :: job :: Nil =>
        jobStatement(sparkF, out, err, job, n => s"ALTER JOB $n SUSPEND")
      case ("resume" | "restart") :: job :: Nil =>
        jobStatement(sparkF, out, err, job, n => s"ALTER JOB $n RESUME")
      case "cancel" :: job :: Nil =>
        jobStatement(sparkF, out, err, job, n => s"DROP JOB $n")
      case "save-snapshot" :: rest =>
        val (cancel, pos) = rest.partition(_ == "--cancel")
        pos match {
          case job :: snap :: Nil if identifier(job) && identifier(snap) =>
            // CREATE SNAPSHOT quiesces the job for a consistent copy; Jet's
            // save-snapshot keeps the job RUNNING unless -C/--cancel — so
            // resume afterwards, or drop it when --cancel was given. Each
            // statement routes like the other verbs (live endpoint first).
            val follow = if (cancel.nonEmpty) s"DROP JOB $job"
                         else s"ALTER JOB $job RESUME"
            val rc = statement(sparkF, out, err, s"CREATE SNAPSHOT $snap FOR JOB $job")
            if (rc == 0) statement(sparkF, out, err, follow) else rc
          case _ =>
            err.println("usage: graft save-snapshot [--cancel] <job> <name>"); 1
        }
      case "delete-snapshot" :: snap :: Nil =>
        jobStatement(sparkF, out, err, snap, n => s"DROP SNAPSHOT $n")
      case "cluster" :: Nil =>
        try {
          val sc = sparkF().sparkContext
          out.println(s"master: ${sc.master}")
          out.println(s"application: ${sc.applicationId}")
          out.println(s"default parallelism: ${sc.defaultParallelism}")
          val execs = sc.statusTracker.getExecutorInfos
          out.println(s"executors: ${execs.length}")
          execs.foreach(e => out.println(s"  ${e.host()} (${e.numRunningTasks()} running tasks)"))
          0
        } catch { case e: Exception => err.println(s"graft: ${e.getMessage}"); 2 }
      case cmd :: _ =>
        err.println(s"graft: unknown or malformed command: ${cmd}")
        err.println(usage)
        1
    }
  }

  /** GraftSql's statement grammar addresses jobs/snapshots as `\w+` — reject
    * anything else up front instead of letting the statement fall through to
    * spark.sql and fail with a parser error.
    */
  private def identifier(s: String): Boolean = s.matches("\\w+")

  /** Lifecycle verbs prefer a LIVE session's control endpoint when one is
    * published (graft.sql.ControlServer — a `graft sql --serve` shell):
    * JobRegistry is process-local, so only the owning session can actually
    * suspend/resume/snapshot its jobs (ADVICE r17). No endpoint → execute
    * in-process (CliSpec / same-JVM embedding — the pre-r18 behavior).
    */
  private def statement(sparkF: () => SparkSession, out: PrintStream,
                        err: PrintStream, stmt: String): Int =
    graft.sql.ControlClient.route(stmt) match {
      case Some(Right(lines)) => lines.foreach(out.println); 0
      case Some(Left(e)) => err.println(s"graft: $e"); 2
      case None =>
        try { render(GraftSql(sparkF()).execute(stmt), out); 0 }
        catch { case e: Exception => err.println(s"graft: ${e.getMessage}"); 2 }
    }

  private def jobStatement(sparkF: () => SparkSession, out: PrintStream,
                           err: PrintStream, name: String,
                           mk: String => String): Int =
    if (!identifier(name)) { err.println(s"graft: invalid name: $name"); 1 }
    else statement(sparkF, out, err, mk(name))

  // ---- submit -----------------------------------------------------------

  private def submit(rest: List[String], out: PrintStream, err: PrintStream,
                     submitRunner: Seq[String] => Int): Int = {
    var clazz: Option[String] = None
    var master: Option[String] = None
    var name: Option[String] = None
    var driverMemory: Option[String] = None
    var confs = List.empty[String]
    var dryRun = false
    var jarAndArgs = List.empty[String]
    var missingValue: Option[String] = None
    var args = rest
    var parsingOpts = true
    while (args.nonEmpty) {
      args = (args, parsingOpts) match {
        case (("--class" | "-c") :: v :: t, true) => clazz = Some(v); t
        case ("--master" :: v :: t, true) => master = Some(v); t
        case (("--name" | "-n") :: v :: t, true) => name = Some(v); t
        case ("--driver-memory" :: v :: t, true) => driverMemory = Some(v); t
        case ("--conf" :: v :: t, true) => confs :+= v; t
        case ("--dry-run" :: t, true) => dryRun = true; t
        // a valued option as the LAST token (ADVICE r17): error out instead
        // of silently treating the literal option string as the jar path
        case ((opt @ ("--class" | "-c" | "--master" | "--name" | "-n" |
                      "--driver-memory" | "--conf")) :: Nil, true) =>
          missingValue = Some(opt); Nil
        case (jar :: t, _) =>
          // first positional = the jar; everything after passes through
          jarAndArgs = jar :: t; parsingOpts = false; Nil
        case (Nil, _) => Nil
      }
    }
    if (missingValue.isDefined) {
      err.println(s"graft submit: option ${missingValue.get} needs a value")
      return 1
    }
    jarAndArgs match {
      case Nil =>
        err.println("usage: graft submit [--class C] [--master M] [--name N] " +
          "[--driver-memory M] [--conf k=v]... [--dry-run] <jar> [args...]")
        1
      case jar :: jobArgs =>
        val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
        val argv = Seq(s"$sparkHome/bin/spark-submit") ++
          clazz.toSeq.flatMap(c => Seq("--class", c)) ++
          master.toSeq.flatMap(m => Seq("--master", m)) ++
          name.toSeq.flatMap(n => Seq("--name", n)) ++
          driverMemory.toSeq.flatMap(m => Seq("--driver-memory", m)) ++
          confs.flatMap(c => Seq("--conf", c)) ++
          Seq(jar) ++ jobArgs
        if (dryRun) { argv.foreach(out.println); 0 }
        else submitRunner(argv)
    }
  }

  // ---- sql shell --------------------------------------------------------

  private def sqlCommand(rest: List[String], sparkF: () => SparkSession,
                         in: InputStream, out: PrintStream,
                         err: PrintStream): Int = {
    var maxRows = 100
    var inline: Option[String] = None
    var serve = false
    var args = rest
    while (args.nonEmpty) {
      args = args match {
        case "--max-rows" :: v :: t =>
          // toIntOption, not toInt (ADVICE r17): a non-numeric value is a
          // usage error, not an uncaught NumberFormatException stack trace
          v.toIntOption match {
            case Some(n) if n > 0 => maxRows = n; t
            case _ =>
              err.println(s"graft sql: --max-rows needs a positive integer, got: $v")
              return 1
          }
        case ("--max-rows" | "-e") :: Nil =>
          err.println(s"graft sql: option ${args.head} needs a value"); return 1
        case "-e" :: v :: t => inline = Some(v); t
        case "--serve" :: t => serve = true; t
        case other :: _ =>
          err.println(s"graft sql: unknown option: $other"); return 1
        case Nil => Nil
      }
    }
    val spark = sparkF()
    val sql = GraftSql(spark)
    // --serve publishes this session's control endpoint so a standalone
    // `graft suspend|resume|...` invocation can manage THIS shell's jobs
    // (graft.sql.ControlServer; ADVICE r17 — lifecycle verbs used to be
    // process-local only)
    val control = if (serve) Some(graft.sql.ControlServer.start(sql)) else None
    control.foreach(h => err.println(s"graft: control endpoint on 127.0.0.1:${h.port}"))
    try inline match {
      case Some(stmts) =>
        var rc = 0
        splitStatements(stmts).foreach { stmt =>
          if (rc == 0) rc = executeAndPrint(sql, stmt, maxRows, out, err)
        }
        rc
      case None => shell(sql, in, out, err, maxRows)
    } finally control.foreach(_.close())
  }

  /** Split a `-e` payload at semicolons (quote-aware: `';'` inside string
    * literals — OPTIONS('a'='b;c') — must not split).
    */
  private[graft] def splitStatements(s: String): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    s.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case ';' if !inQuote =>
        if (cur.toString.trim.nonEmpty) buf += cur.toString.trim
        cur.clear()
      case c => cur += c
    }
    if (cur.toString.trim.nonEmpty) buf += cur.toString.trim
    buf.toSeq
  }

  /** Interactive loop: accumulate lines until one ends with `;`, execute,
    * print. `exit` / `quit` / `\q` (with or without `;`) leave the shell —
    * the same console verbs Jet's SQL shell accepts (JetCommandLine sql).
    */
  private def shell(sql: GraftSql, in: InputStream, out: PrintStream,
                    err: PrintStream, maxRows: Int): Int = {
    val reader = new BufferedReader(new InputStreamReader(in))
    val interactive = System.console() != null
    val buf = new StringBuilder
    var line: String = null
    if (interactive) out.print("graft> ")
    if (interactive) out.flush()
    while ({ line = reader.readLine(); line != null }) {
      val trimmed = line.trim
      val bare = trimmed.stripSuffix(";").trim.toLowerCase
      if (buf.isEmpty && (bare == "exit" || bare == "quit" || bare == "\\q"))
        return 0
      if (buf.isEmpty && bare == "help") {
        out.println(usage)
      } else {
        buf.append(line).append('\n')
        if (trimmed.endsWith(";")) {
          val stmts = splitStatements(buf.toString)
          buf.clear()
          stmts.foreach(executeAndPrint(sql, _, maxRows, out, err))
        }
      }
      if (interactive) out.print(if (buf.isEmpty) "graft> " else "     > ")
      if (interactive) out.flush()
    }
    0
  }

  /** Execute one statement; errors print and keep the shell alive. */
  private def executeAndPrint(sql: GraftSql, stmt: String, maxRows: Int,
                              out: PrintStream, err: PrintStream): Int =
    try {
      val df = sql.execute(stmt)
      if (df.isStreaming) streamAndPrint(sql, stmt, maxRows, out)
      else render(df, out, maxRows)
      0
    } catch {
      case e: Exception =>
        err.println(s"graft: ${Option(e.getMessage).getOrElse(e.toString)}")
        2
    }

  /** Jet's infinite streaming SELECT cursor, bounded for a console: rows
    * print as micro-batches produce them, up to maxRows (then the query
    * stops — the console analog of the client closing its SqlResult).
    */
  private def streamAndPrint(sql: GraftSql, stmt: String, maxRows: Int,
                             out: PrintStream): Unit = {
    val cur = sql.cursor(stmt)
    try {
      var printed = 0
      var header: Option[Seq[String]] = None
      var emptyFetches = 0
      while (printed < maxRows && emptyFetches < 2) {
        val rows = cur.fetch(timeoutMs = 15000)
        if (rows.isEmpty) emptyFetches += 1
        else {
          emptyFetches = 0
          if (header.isEmpty && rows.nonEmpty) {
            header = Some(rows.head.schema.fieldNames.toSeq)
            out.println(header.get.mkString(" | "))
          }
          rows.take(maxRows - printed).foreach { r =>
            out.println(r.toSeq.map(cell).mkString(" | "))
          }
          printed += math.min(rows.length, maxRows - printed)
        }
      }
      out.println(s"($printed streamed row(s))")
    } finally cur.close()
  }

  private def cell(v: Any): String = v match {
    case null => "NULL"
    case a: Array[_] => a.mkString("[", ",", "]")
    case s: Seq[_] => s.mkString("[", ",", "]")
    case other => other.toString
  }

  /** Fixed-width page of a batch result (the CLI's own formatter — df.show
    * prints to System.out, not a caller-provided stream).
    */
  private def render(df: DataFrame, out: PrintStream, maxRows: Int = 100): Unit = {
    val names = df.columns.toSeq
    val rows = df.take(maxRows + 1)
    val shown = rows.take(maxRows)
    val cells = shown.map(r => r.toSeq.map(cell))
    val widths = names.indices.map { i =>
      (names(i).length +: cells.map(_(i).length)).max
    }
    def fmt(vals: Seq[String]): String =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" | ")
    out.println(fmt(names))
    out.println(widths.map("-" * _).mkString("-+-"))
    cells.foreach(c => out.println(fmt(c)))
    if (rows.length > maxRows) out.println(s"($maxRows+ rows, truncated)")
    else out.println(s"(${shown.length} row(s))")
  }
}
