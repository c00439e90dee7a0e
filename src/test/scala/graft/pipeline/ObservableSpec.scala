package graft.pipeline

import graft.SparkSpec

/** `Sinks.observable` + the `Observable` client channel (Jet Observable /
  * JetInstance.getObservable): onNext per row, onComplete at job end,
  * late-subscriber replay, capacity retention, error propagation.
  */
class ObservableSpec extends SparkSpec {

  import spark.implicits._

  test("observer subscribed before the job sees every row then onComplete") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var completed = false
    Observables.get[org.apache.spark.sql.Row]("obs_live")
      .addObserver(r => { seen += r.getLong(0); () }, _ => (), () => completed = true)
    Sinks.observable("obs_live").write(spark.range(5).toDF("v"))
    assert(seen.toSet === Set(0L, 1L, 2L, 3L, 4L))
    assert(completed, "onComplete fires when the batch job finishes")
    Observables.get[org.apache.spark.sql.Row]("obs_live").destroy()
  }

  test("late subscriber replays retained rows and the terminal event") {
    Sinks.observable("obs_late").write(Seq(7L, 8L).toDF("v"))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    @volatile var completed = false
    Observables.get[org.apache.spark.sql.Row]("obs_late")
      .addObserver(r => { seen += r.getLong(0); () }, _ => (), () => completed = true)
    assert(seen.toSeq.sorted === Seq(7L, 8L) && completed)
    // iterator form sees the same retained set
    val it = Observables.get[org.apache.spark.sql.Row]("obs_late")
      .iterator.map(_.getLong(0)).toSeq.sorted
    assert(it === Seq(7L, 8L))
    Observables.get[org.apache.spark.sql.Row]("obs_late").destroy()
  }

  test("configureCapacity bounds retention (oldest rows dropped for late iterators)") {
    Observables.get[org.apache.spark.sql.Row]("obs_cap").configureCapacity(3)
    Sinks.observable("obs_cap").write(spark.range(10).toDF("v"))
    val kept = Observables.get[org.apache.spark.sql.Row]("obs_cap")
      .iterator.map(_.getLong(0)).toSeq
    assert(kept.size === 3, s"retention bound: $kept")
    Observables.get[org.apache.spark.sql.Row]("obs_cap").destroy()
  }

  test("a failing job surfaces through onError") {
    @volatile var err: Throwable = null
    Observables.get[org.apache.spark.sql.Row]("obs_err")
      .addObserver(_ => (), e => err = e, () => ())
    val boom = spark.range(3).as[Long]
      .map[Long](_ => throw new RuntimeException("job failed")).toDF("v")
    intercept[Exception] { Sinks.observable("obs_err").write(boom) }
    assert(err != null, "observer got onError")
    Observables.get[org.apache.spark.sql.Row]("obs_err").destroy()
  }
}
