package graft.pipeline

import graft.SparkSpec
import javax.transaction.xa.{XAException, XAResource}

/** Crash-window drive of the XA-shaped exactly-once protocol
  * ([[XaShapedSink]]) against the in-JVM resource manager — the same
  * discipline KafkaShapedSinkSpec applies to the kafka-shaped 2PC:
  * every window of the prepare/commit split is entered deliberately and
  * the visible-message set checked for exactly-once.
  */
class XaShapedSinkSpec extends SparkSpec {

  private var n = 0
  private def freshRm(): (String, InMemoryXaResourceManager) = {
    n += 1
    val name = s"xa_spec_${System.nanoTime()}_$n"
    (name, InMemoryXaResourceManager.named(name))
  }
  private def rows(vs: String*): Iterator[String] = vs.iterator

  test("happy path: batch b commits at the start of b+1; visibility lags one batch") {
    val (_, rm) = freshRm()
    val s0 = rm.session("j-p0")
    assert(!XaShapedSink.deliverPartition(s0.xaResource, s0.send("q", _),
      "j", 0, 0L, rows("a", "b")), "fresh batch, not a replay")
    // prepared, not committed: nothing visible yet (Jet's one-snapshot lag)
    assert(rm.visible("q") === Seq.empty)
    val s1 = rm.session("j-p0")
    assert(!XaShapedSink.deliverPartition(s1.xaResource, s1.send("q", _),
      "j", 0, 1L, rows("c")))
    assert(rm.visible("q") === Seq("a", "b"))
    // graceful shutdown: the closing sweep flushes the final batch
    XaShapedSink.commitPrepared(s1.xaResource, "j", 0)
    assert(rm.visible("q") === Seq("a", "b", "c"))
  }

  test("crash BEFORE prepare: unfinished work dies with the session; replay re-sends once") {
    val (_, rm) = freshRm()
    val s0 = rm.session("j-p0")
    // simulate a crash mid-batch: transaction started, rows sent, no prepare
    val xid = XaShapedSink.GraftXid("j", 0, 0L)
    s0.xaResource.start(xid, XAResource.TMNOFLAGS)
    s0.send("q", "a")
    rm.crashSession("j-p0")
    assert(rm.visible("q") === Seq.empty, "uncommitted work must never be visible")
    // replay of batch 0 on a new session: nothing prepared -> fresh send
    val s1 = rm.session("j-p0")
    assert(!XaShapedSink.deliverPartition(s1.xaResource, s1.send("q", _),
      "j", 0, 0L, rows("a")), "nothing prepared -> not a prepared-replay")
    XaShapedSink.commitPrepared(s1.xaResource, "j", 0)
    assert(rm.visible("q") === Seq("a"), "exactly one copy after crash-replay")
  }

  test("crash AFTER prepare: replay ROLLS BACK the undurable prepared txn and re-sends") {
    val (_, rm) = freshRm()
    val s0 = rm.session("j-p0")
    XaShapedSink.deliverPartition(s0.xaResource, s0.send("q", _),
      "j", 0, 0L, rows("a", "b"))
    rm.crashSession("j-p0") // prepared txn SURVIVES (the XA property)
    assert(rm.visible("q") === Seq.empty)
    // batch 0 is being REPLAYED, which proves the engine never recorded it:
    // the prepared txn must be rolled back (its rows were never visible)
    // and the batch re-sent — NOT sweep-committed, which would leave a
    // double-crash duplicate window (see the double-crash test below)
    val s1 = rm.session("j-p0")
    val replayed = XaShapedSink.deliverPartition(s1.xaResource, s1.send("q", _),
      "j", 0, 0L, rows("a", "b"))
    assert(replayed, "must report the prepared replay rollback")
    XaShapedSink.commitPrepared(s1.xaResource, "j", 0)
    assert(rm.visible("q") === Seq("a", "b"), "rows visible exactly once")
  }

  test("double crash in the prepare window: repeated replays still deliver exactly once") {
    val (_, rm) = freshRm()
    // incarnation 1: prepare batch 0, crash before the engine records it
    val s0 = rm.session("j-p0")
    XaShapedSink.deliverPartition(s0.xaResource, s0.send("q", _), "j", 0, 0L, rows("a"))
    rm.crashSession("j-p0")
    // incarnation 2: replays batch 0 (rollback + re-send + prepare), then
    // ALSO crashes before the engine records it — the window the old
    // sweep-commit protocol turned into a duplicate
    val s1 = rm.session("j-p0")
    XaShapedSink.deliverPartition(s1.xaResource, s1.send("q", _), "j", 0, 0L, rows("a"))
    rm.crashSession("j-p0")
    assert(rm.visible("q") === Seq.empty, "nothing visible across both crashes")
    // incarnation 3: replays batch 0 again, survives; batch 1 commits it
    val s2 = rm.session("j-p0")
    XaShapedSink.deliverPartition(s2.xaResource, s2.send("q", _), "j", 0, 0L, rows("a"))
    XaShapedSink.deliverPartition(s2.xaResource, s2.send("q", _), "j", 0, 1L, rows("b"))
    XaShapedSink.commitPrepared(s2.xaResource, "j", 0)
    assert(rm.visible("q") === Seq("a", "b"), "exactly one copy of the thrice-attempted batch")
  }

  test("interrupted stop: the upTo-gated sweep rolls back the unrecorded batch") {
    val (_, rm) = freshRm()
    val s0 = rm.session("j-p0")
    XaShapedSink.deliverPartition(s0.xaResource, s0.send("q", _), "j", 0, 0L, rows("a"))
    XaShapedSink.deliverPartition(s0.xaResource, s0.send("q", _), "j", 0, 1L, rows("b"))
    // query.stop() landed after batch 1's prepare but BEFORE the engine
    // wrote 1 to its commit log: the sweep must only commit <= 0 — a
    // commit-everything sweep here would make "b" visible AND the restart
    // replay batch 1 again (the graceful-path duplicate window)
    XaShapedSink.commitPrepared(s0.xaResource, "j", 0, upTo = 0L)
    assert(rm.visible("q") === Seq("a"), "recorded batch visible, unrecorded not")
    // restart replays batch 1: nothing prepared for it anymore -> fresh send
    val s1 = rm.session("j-p0")
    assert(!XaShapedSink.deliverPartition(s1.xaResource, s1.send("q", _),
      "j", 0, 1L, rows("b")), "rolled-back batch replays as a fresh send")
    XaShapedSink.commitPrepared(s1.xaResource, "j", 0, upTo = 1L)
    assert(rm.visible("q") === Seq("a", "b"), "exactly once through the interrupted stop")
  }

  test("lastEngineCommittedBatch reads the checkpoint commit log") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xa_cl_")
    assert(XaShapedSink.lastEngineCommittedBatch(dir.toString).isEmpty)
    val commits = new java.io.File(dir.toFile, "commits")
    commits.mkdirs()
    Seq("0", "1", "7", ".tmp_x", "metadata").foreach { n =>
      new java.io.File(commits, n).createNewFile()
    }
    assert(XaShapedSink.lastEngineCommittedBatch(dir.toString) === Some(7L))
  }

  test("XIDs of a job id containing ':' round-trip through parse (right-split)") {
    val xid = XaShapedSink.GraftXid("ns:job", 3, 7L)
    assert(XaShapedSink.parse(xid, "ns:job", 3) === Some(7L))
    assert(XaShapedSink.parse(xid, "ns", 3) === None, "prefix job is foreign")
    assert(XaShapedSink.parse(xid, "ns:job", 2) === None, "other partition is foreign")
  }

  test("commit is idempotent across incarnations (XAER_NOTA treated as done)") {
    val (_, rm) = freshRm()
    val s0 = rm.session("j-p0")
    XaShapedSink.deliverPartition(s0.xaResource, s0.send("q", _), "j", 0, 0L, rows("a"))
    XaShapedSink.commitPrepared(s0.xaResource, "j", 0)
    // a zombie incarnation sweeping again must not fail or duplicate
    XaShapedSink.commitPrepared(rm.session("j-p0").xaResource, "j", 0)
    assert(rm.visible("q") === Seq("a"))
    // and a raw double-commit surfaces NOTA from the RM (the code the
    // idempotent wrapper absorbs)
    val e = intercept[XAException] {
      s0.xaResource.commit(XaShapedSink.GraftXid("j", 0, 0L), false)
    }
    assert(e.errorCode == XAException.XAER_NOTA)
  }

  test("foreign prepared XIDs (other jobs) are never touched by the sweep") {
    val (_, rm) = freshRm()
    val other = rm.session("other-p0")
    val foreign = XaShapedSink.GraftXid("otherjob", 0, 5L)
    other.xaResource.start(foreign, XAResource.TMNOFLAGS)
    other.send("q", "foreign")
    other.xaResource.end(foreign, XAResource.TMSUCCESS)
    other.xaResource.prepare(foreign)
    val s = rm.session("j-p0")
    XaShapedSink.deliverPartition(s.xaResource, s.send("q", _), "j", 0, 0L, rows("a"))
    XaShapedSink.commitPrepared(s.xaResource, "j", 0)
    assert(rm.visible("q") === Seq("a"), "foreign txn neither committed nor rolled back")
    assert(s.xaResource.recover(XAResource.TMSTARTRSCAN).length == 1)
  }

  test("many-partition concurrent crash-replay: XID sweeps stay isolated per partition") {
    // VERDICT r10 item 7: all partitions of one sink crash after preparing
    // batch 0 against ONE resource manager, then replay SIMULTANEOUSLY.
    // Every partition's recover() scan sees every other partition's
    // prepared XIDs — the parse()-filtered sweep must roll back/commit ONLY
    // its own, under full interleaving.
    val (_, rm) = freshRm()
    val P = 8
    (0 until P).foreach { p =>
      val s0 = rm.session(s"j-p$p")
      XaShapedSink.deliverPartition(s0.xaResource, s0.send("q", _),
        "j", p, 0L, rows(s"b0-p$p"))
      rm.crashSession(s"j-p$p")
    }
    assert(rm.visible("q").isEmpty, "nothing visible after the fleet crash")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until P).map { p =>
      new Thread(() => {
        try {
          val s1 = rm.session(s"j-p$p")
          val replayed = XaShapedSink.deliverPartition(s1.xaResource,
            s1.send("q", _), "j", p, 0L, rows(s"b0-p$p"))
          assert(replayed, s"p$p must see its own prepared batch 0")
          XaShapedSink.deliverPartition(s1.xaResource, s1.send("q", _),
            "j", p, 1L, rows(s"b1-p$p"))
          XaShapedSink.commitPrepared(s1.xaResource, "j", p, upTo = 1L)
        } catch { case t: Throwable => errors.add(t); () }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errors.isEmpty, s"concurrent replay must not cross partitions: ${errors.peek()}")
    val vis = rm.visible("q").sorted
    val want = (0 until P).flatMap(p => Seq(s"b0-p$p", s"b1-p$p")).sorted
    assert(vis === want, s"exactly-once per partition under concurrency: $vis")
  }

  test("end-to-end through a streaming query: crash after prepare, restart, exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (rmName, rm) = freshRm()
    val dir = java.nio.file.Files.createTempDirectory("graft_xa_ckpt_").toString
    val mem = MemoryStream[Long]
    def start() = XaShapedSink.sink(rmName, "xj", "q",
      checkpoint = Some(s"$dir/ckpt"), parts = 2).start(mem.toDF())

    mem.addData(1L, 2L, 3L)
    val job1 = start()
    job1.processAllAvailable()
    job1.cancel() // batch 0 prepared on both partitions, nothing committed
    assert(rm.visible("q") === Seq.empty)

    // restart from the checkpoint: batch 1 delivers, committing batch 0;
    // batch 0 is NOT replayed (Spark recorded it) but its prepared txns
    // must become visible via the sweep
    mem.addData(4L)
    val job2 = start()
    job2.processAllAvailable()
    // closing sweep on both partitions (graceful shutdown)
    (0 until 2).foreach { p =>
      XaShapedSink.commitPrepared(rm.session(s"xj-p$p").xaResource, "xj", p)
    }
    job2.cancel()
    assert(rm.visible("q").size == 4, s"exactly-once: ${rm.visible("q")}")
    assert(rm.visible("q").distinct.size == 4, "no duplicate deliveries")
  }
}
