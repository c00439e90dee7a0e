package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** CEP pattern matching on a stream (Jet examples/pattern-matching parity,
  * built on keyed `mapStateful` exactly like the reference builds it on
  * TransformStatefulP — SURVEY §2.9). State per user = timestamp of the most
  * recent `view`; a `purchase` within the window emits a match and clears the
  * state (each view is consumed by at most one purchase).
  */
class CepStreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("view→purchase within 15 min detected across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)] // (user, ts, type)

    val matches = StatefulOps.mapStateful[Long, (Long, Timestamp, String), Long, (Long, Long, Long)](
      mem.toDS(), _._1, ttlMillis = 0,
      createFn = () => -1L, // epoch-sec of last view; -1 = none
      mapFn = (user, lastView, ev) => {
        val (_, t, typ) = ev
        val sec = t.getTime / 1000
        typ match {
          case "view" => (sec, (-1L, -1L, -1L)) // remember view, no output
          case "purchase" if lastView >= 0 && sec - lastView <= 900 =>
            (-1L, (user, lastView, sec)) // match: consume the view
          case _ => (lastView, (-1L, -1L, -1L))
        }
      }).filter(_._1 >= 0)

    val job = StreamSinks.memory("cep_test", "append").start(matches.toDF())

    // batch 1: u1 views; u2 purchases with no prior view
    mem.addData((1L, ts("2024-01-01 00:00:00"), "view"),
                (2L, ts("2024-01-01 00:01:00"), "purchase"))
    job.processAllAvailable()
    // batch 2 (state crosses the micro-batch boundary):
    // u1 purchase 10 min after the view -> match; then another purchase -> no rematch
    mem.addData((1L, ts("2024-01-01 00:10:00"), "purchase"),
                (1L, ts("2024-01-01 00:12:00"), "purchase"))
    job.processAllAvailable()
    // batch 3: u2 view then purchase 20 min later -> outside window, no match
    mem.addData((2L, ts("2024-01-01 01:00:00"), "view"),
                (2L, ts("2024-01-01 01:20:01"), "purchase"))
    job.processAllAvailable()

    val rows = spark.table("cep_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, ts("2024-01-01 00:00:00").getTime / 1000,
                              ts("2024-01-01 00:10:00").getTime / 1000)))
    job.cancel()
  }
}
