package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import java.nio.file.Files

/** Socket source→sink round trip (reference: Sources.socket Sources.java:950,
  * Sinks.socket Sinks.java:913) and the streaming file watcher with a declared
  * schema (Sources.jsonWatcher Sources.java:1030) + AssertionSinks vocabulary
  * (pipeline/test/AssertionSinks.java).
  */
class SocketWatcherSpec extends SparkSpec {

  import spark.implicits._

  test("socket sink writes rows as lines; socket source reads them back") {
    // collector server for the SINK side
    val collector = new ServerSocket(0)
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val collectorThread = new Thread(() => {
      try while (!collector.isClosed) {
        val s = collector.accept()
        val in = new BufferedReader(new InputStreamReader(s.getInputStream))
        Iterator.continually(in.readLine()).takeWhile(_ != null).foreach(collected.add)
        s.close()
      } catch { case _: java.net.SocketException => () }
    })
    collectorThread.setDaemon(true)
    collectorThread.start()

    // feeder server for the SOURCE side: one client (the stream), push lines
    val feeder = new ServerSocket(0)
    val feederThread = new Thread(() => {
      val s = feeder.accept()
      val out = new PrintWriter(s.getOutputStream, true)
      Seq("alpha", "beta", "gamma").foreach(out.println)
      out.flush()
      // keep the connection open long enough for the micro-batch to drain
      Thread.sleep(3000)
      s.close()
    })
    feederThread.setDaemon(true)
    feederThread.start()

    // round trip: socket source → transform → socket sink (per micro-batch)
    val stream = Pipeline.create(spark)
      .readFrom(Sources.socket("localhost", feeder.getLocalPort))
      .withoutTimestamps()
    val sink = Sinks.socket("localhost", collector.getLocalPort)
    val handle = StreamSinks.foreachBatch((batch, _) =>
      sink.write(batch.select(upper(col("value")).as("v"))))
      .start(stream.df)
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (collected.size < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(collected.toArray.map(_.toString).toSet === Set("ALPHA", "BETA", "GAMMA"))
    } finally {
      handle.cancel(); feeder.close(); collector.close()
    }
  }

  test("fileWatcher streams json files with a declared schema (jsonWatcher)") {
    val dir = Files.createTempDirectory("graft_watch_").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"id":1,"name":"x"}""" + "\n" + """{"id":2,"name":"y"}""" + "\n")
    val stream = Pipeline.create(spark).readFrom(Sources.jsonWatcher(dir, schema))
      .withoutTimestamps()
    AssertionSinks.assertCollectedEventually(stream.df, timeoutMs = 20000) { rows =>
      rows.map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "x"), (2L, "y"))
    }
  }

  test("fileWatcher on an empty dir without a schema fails with a clear error") {
    val dir = Files.createTempDirectory("graft_watch_empty_").toString
    val e = intercept[IllegalArgumentException] {
      Sources.fileWatcher(dir, "json").read(spark)
    }
    assert(e.getMessage.contains("schema"))
  }

  test("assertOrdered / assertAnyOrder / assertContains vocabulary") {
    val p = Pipeline.create(spark)
    p.wrap(Seq(1, 2, 3).toDF("v").orderBy("v"))
      .writeTo(AssertionSinks.assertOrdered(Seq(1, 2, 3)))
    p.wrap(Seq(("b", 2), ("a", 1)).toDF("k", "n"))
      .writeTo(AssertionSinks.assertAnyOrder(Seq(Seq("a", 1), Seq("b", 2))))
    p.wrap(Seq(1, 2, 3, 4).toDF("v"))
      .writeTo(AssertionSinks.assertContains(Seq(2, 4)))
    intercept[AssertionError] {
      p.wrap(Seq(1, 2).toDF("v")).writeTo(AssertionSinks.assertAnyOrder(Seq(1, 3)))
    }
  }
}
