package graft.pipeline

import java.sql.DriverManager

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r10 name-parity additions actually EXECUTE (no stub aliases): the
  * journal sources under their Jet names, the remote sink aliases, the
  * files/jdbc/jms builders, and the from-processor escape hatches.
  */
class NamedApiParitySpec extends SparkSpec {

  import spark.implicits._

  test("Sources.mapJournal(startFromOldest) streams the SYNC snapshot of a store") {
    KeyedStore.clear()
    Sinks.map("parity_store", "k").write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val stream = Sources.mapJournal("parity_store", startFromOldest = true).read(spark)
    val job = StreamSinks.memory("parity_journal", "append").start(stream)
    try {
      job.processAllAvailable()
      // journal record frame: (op, version, key-json, value-json)
      val rows = spark.table("parity_journal")
        .select($"op", get_json_object($"value", "$.k").cast("long").as("k"),
          get_json_object($"value", "$.v").as("v"))
        .as[(String, Long, String)].collect().toSet
      assert(rows === Set(("SYNC", 1L, "a"), ("SYNC", 2L, "b")))
    } finally job.cancel()
  }

  test("remote sink aliases write through the same store paths") {
    KeyedStore.clear()
    Sinks.remoteList("parity_rlist").write(Seq(1, 2, 3).toDF("x"))
    assert(Sources.remoteList("parity_rlist").read(spark).count() === 3)
    Sinks.remoteCache("parity_rcache", "k").write(Seq((1L, "x")).toDF("k", "v"))
    assert(Sources.remoteCache("parity_rcache").read(spark).count() === 1)
  }

  test("filesBuilder: fluent format/option/mode builds the tested files sink") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fsb_").toString + "/out"
    Sinks.filesBuilder(dir).format("csv").option("header", "true").mode("overwrite")
      .build().write(Seq((1, "a"), (2, "b")).toDF("id", "s"))
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 2 && back.columns.toSeq === Seq("id", "s"))
  }

  test("jdbcBuilder: plain build appends; exactlyOnce build delivers through the 2PC sink") {
    val url = "jdbc:derby:memory:graftparity;create=true"
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute("CREATE TABLE t_parity(id INT)")
    catch { case _: Throwable => () } finally c.close()
    val props = new java.util.Properties()
    Sinks.jdbcBuilder(url, "t_parity").build()
      .write(Seq(1, 2).toDF("id"))
    // exactly-once path: delivery via the transactional writeBatch; a replay
    // of the same job/batch is skipped by the progress marker
    val eo = Sinks.jdbcBuilder(url, "t_parity")
      .exactlyOnce("parity_job").updateQuery("INSERT INTO t_parity VALUES (?)")
      .partitions(2).build()
    eo.write(Seq(3, 4).toDF("id"))
    eo.write(Seq(3, 4).toDF("id")) // replayed batch: must not duplicate
    val c2 = DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement().executeQuery("SELECT COUNT(*) FROM t_parity")
      rs.next()
      assert(rs.getInt(1) === 4, "2 plain + 2 exactly-once, replay skipped")
    } finally c2.close()
  }

  test("jms builders: fluent source pump and sink build() run the tested adapters") {
    val inbox = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    inbox.add("m1"); inbox.add("m2")
    val src = Connectors.jmsQueueBuilder[String, String]("q")
      .connectionFn(n => n)
      .receiveFn(_ => Option(inbox.poll()).map(Seq(_)))
      .closeFn(_ => ())
      .build()
    val built = src(spark)
    val job = StreamSinks.memory("parity_jms", "append").start(built.df)
    try {
      (1 to 20).foreach { _ => job.processAllAvailable(); Thread.sleep(50) }
      val got = spark.table("parity_jms").as[String].collect().toSet
      assert(Set("m1", "m2").subsetOf(got), s"got $got")
    } finally { job.cancel(); built.stop() }
  }

  test("fromProcessor escape hatches: custom batch source, stream source, custom sink") {
    val seen = new java.util.concurrent.atomic.AtomicLong()
    val src = Sources.batchFromProcessor(s => s.range(5))
    val sink = Sinks.fromProcessor("counter")(df => seen.set(df.count()))
    sink.write(Pipeline.create(spark).readFrom(src).toDF)
    assert(seen.get() === 5)
    val ss = Sources.streamFromProcessorWithWatermarks("ts", "1 second") { s =>
      import s.implicits._
      s.readStream.format("rate").option("rowsPerSecond", "5").load()
        .select($"timestamp".as("ts"), $"value")
    }
    val job = StreamSinks.memory("parity_proc_stream", "append").start(ss.read(spark))
    try {
      Thread.sleep(1500)
      job.processAllAvailable()
      assert(spark.table("parity_proc_stream").count() >= 0) // stream runs
    } finally job.cancel()
  }
}
