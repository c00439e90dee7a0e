package graft.pipeline

import javax.transaction.xa.{XAException, XAResource, Xid}

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame

/** XA-shaped exactly-once sink — the reference's JMS/JDBC XA protocol
  * (`impl/processor/XaSinkProcessorBase.java`, used by `WriteJmsP` for
  * `Sinks.jmsQueue(...).exactlyOnce()`): two-phase commit against a real
  * `javax.transaction.xa.XAResource` (the interface is part of the JDK,
  * module `java.transaction.xa`), where the property doing the work is that
  * a PREPARED transaction survives client crash and is found again via
  * `recover()`.
  *
  * The reference's protocol, mapped onto micro-batches:
  *
  *   - snapshot phase 1 = `end(xid, TMSUCCESS)` + `prepare(xid)` — here at
  *     the END of delivering batch b (messages sent inside the transaction
  *     are invisible until commit);
  *   - phase 2 = `commit(xid, false)` AFTER the snapshot is durable — here
  *     deferred to the START of batch b+1, by which point Spark's commit
  *     log has recorded b (the same prepare-before-durability /
  *     commit-after-durability split as Jet's snapshot barrier; visibility
  *     lags one batch exactly as Jet's lags one snapshot);
  *   - restart = `recover(TMSTARTRSCAN|TMENDRSCAN)`, then for each of OUR
  *     prepared XIDs (matched by formatId + jobId/partition prefix —
  *     `XaSinkProcessorBase` matches on its gtrid prefix the same way):
  *     commit only ids STRICTLY BELOW the replayed batch — the engine
  *     having advanced past them proves they are in its commit log, i.e.
  *     durable (the reference restore-commits only transactions belonging
  *     to a durable snapshot); roll back ids ≥ the replayed batch and
  *     re-send. Rolling back the replayed batch's own prepared txn is the
  *     load-bearing choice: its prepare happened, but the engine never
  *     recorded the batch (that is WHY it is being replayed), so
  *     sweep-committing it would open a double-crash duplicate window —
  *     crash again after the sweep-commit but before the engine records
  *     the batch, and the next replay finds no prepared XID and re-sends
  *     rows that are already visible. Rollback is always safe here: a
  *     rolled-back transaction's messages were never visible.
  *   - `XAER_NOTA` on commit = another incarnation already committed —
  *     success, not an error (commit idempotence across incarnations).
  *
  * Crash windows, each spec-driven (XaShapedSinkSpec):
  * before `prepare` → the resource manager rolls the unfinished transaction
  * back when the session dies, replay re-sends, nothing was visible;
  * after `prepare`, before the engine records the batch → replay finds the
  * XID in `recover()`, ROLLS IT BACK (never visible) and re-sends — robust
  * to any number of further crashes in the same window; after the engine
  * records the batch → the next batch's sweep sees b < batchId and commits;
  * after commit → the XID is gone and XAER_NOTA on a zombie's re-commit is
  * success.
  *
  * The sandbox has no XA broker, so [[InMemoryXaResourceManager]] implements
  * the resource-manager semantics (prepared-state durability across session
  * crash, rollback-on-session-death for unprepared work, XAER_NOTA/XAER_DUPID
  * error codes) and the spec drives the adapter through the crash windows
  * against it. A real deployment passes the `XAResource` of a
  * `javax.jms.XASession` (or an XADataSource connection) — every call maps
  * 1:1.
  */
object XaShapedSink {

  /** XID: formatId is a fixed magic; gtrid = "job:partition:batch" (the
    * reference packs job id + vertex + processor index the same way,
    * `XaSinkProcessorBase.java` gtrid layout); bqual fixed.
    */
  final val FormatId = 0x67726166 // "graf"

  final case class GraftXid(job: String, part: Int, batch: Long) extends Xid {
    override def getFormatId: Int = FormatId
    override def getGlobalTransactionId: Array[Byte] =
      s"$job:$part:$batch".getBytes("UTF-8")
    override def getBranchQualifier: Array[Byte] = Array[Byte](1)
  }

  /** Parse one of OUR xids back (None for foreign xids — other jobs or
    * other software sharing the resource manager). Split from the RIGHT:
    * the last two fields are part and batch, everything before them is the
    * job id — so a job id containing ':' still round-trips instead of its
    * XIDs being mistaken for foreign and left prepared forever.
    */
  def parse(x: Xid, job: String, part: Int): Option[Long] = {
    if (x.getFormatId != FormatId) return None
    val s = new String(x.getGlobalTransactionId, "UTF-8")
    val i2 = s.lastIndexOf(':')
    val i1 = if (i2 < 0) -1 else s.lastIndexOf(':', i2 - 1)
    if (i1 < 0 || s.substring(0, i1) != job) None
    else if (!s.substring(i1 + 1, i2).toIntOption.contains(part)) None
    else s.substring(i2 + 1).toLongOption
  }

  /** Commit that treats XAER_NOTA as success (already committed by a prior
    * incarnation — the idempotence rule every XA client needs on replay).
    */
  private def commitIdempotent(res: XAResource, xid: Xid): Unit =
    try res.commit(xid, false)
    catch { case e: XAException if e.errorCode == XAException.XAER_NOTA => () }

  /** One partition's micro-batch through the XA protocol. Returns true iff
    * a replayed prepared transaction for THIS batch was rolled back first
    * (i.e. the call re-sent a batch a prior incarnation had prepared).
    */
  def deliverPartition(res: XAResource, send: String => Unit, job: String,
                       part: Int, batchId: Long, rows: Iterator[String]): Boolean = {
    // restart/continuation sweep: finalize our prepared history first.
    // b < batchId  → the engine advanced past b, so b is in its commit log
    //                (durable) → commit.
    // b >= batchId → NOT durable: being handed batchId proves the engine's
    //                log stops before it (including b == batchId — a replay
    //                happens precisely because the batch was never
    //                recorded) → roll back and (re-)send below. Committing
    //                b == batchId here instead would leave a double-crash
    //                window: die after that commit but before the engine
    //                records the batch, and the NEXT replay finds no
    //                prepared XID, re-sends, and duplicates the delivery.
    val prepared = res.recover(XAResource.TMSTARTRSCAN | XAResource.TMENDRSCAN)
      .toSeq.flatMap(x => parse(x, job, part).map(b => (b, x)))
    var rolledBackThis = false
    prepared.sortBy(_._1).foreach { case (b, xid) =>
      if (b < batchId) commitIdempotent(res, xid)
      else {
        res.rollback(xid)
        if (b == batchId) rolledBackThis = true
      }
    }
    val xid = GraftXid(job, part, batchId)
    res.start(xid, XAResource.TMNOFLAGS)
    try {
      rows.foreach(send)
      res.end(xid, XAResource.TMSUCCESS)
      res.prepare(xid)
      // commit deferred to the next batch / closing sweep: by then the
      // engine's commit log has recorded this batch, closing the
      // crash-after-commit-before-durability duplicate window
      ()
    } catch {
      case e: Throwable =>
        try { res.end(xid, XAResource.TMFAIL); res.rollback(xid) }
        catch { case _: Throwable => () }
        throw e
    }
    rolledBackThis
  }

  /** Graceful-shutdown sweep: commit the prepared transactions of this
    * (job, part) whose batch id the ENGINE has recorded as committed —
    * the reference does the same on job completion so the final snapshot's
    * messages become visible without waiting for a next batch.
    *
    * `upTo` is the last engine-recorded batch id (read it from the
    * checkpoint commit log via [[lastEngineCommittedBatch]]). Prepared
    * transactions ABOVE it are rolled back, not committed: `query.stop()`
    * can interrupt after `prepare` but before Spark writes the batch to
    * its commit log, and committing that batch here would reopen the
    * double-crash duplicate window through the "graceful" path — the
    * restart replays the unrecorded batch and re-sends it. The
    * no-argument default (`upTo = Long.MaxValue`, commit everything) is
    * ONLY sound after a batch-aligned stop (`processAllAvailable` +
    * `stop` + `awaitTermination`), where every prepared batch is known
    * recorded.
    */
  def commitPrepared(res: XAResource, job: String, part: Int,
                     upTo: Long = Long.MaxValue): Unit =
    res.recover(XAResource.TMSTARTRSCAN | XAResource.TMENDRSCAN).toSeq
      .foreach(x => parse(x, job, part).foreach { b =>
        if (b <= upTo) commitIdempotent(res, x)
        else try res.rollback(x)
        catch { case e: XAException if e.errorCode == XAException.XAER_NOTA => () }
      })

  /** Last batch id the engine durably recorded: the max numeric entry in
    * the streaming checkpoint's `commits/` log (the file is written AFTER
    * every sink partition delivered — Spark's micro-batch commit point).
    * None for a checkpoint that never completed a batch.
    */
  def lastEngineCommittedBatch(checkpoint: String): Option[Long] = {
    val dir = new java.io.File(checkpoint, "commits")
    val ids = Option(dir.list()).getOrElse(Array.empty[String])
      .flatMap(_.toLongOption)
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Write one micro-batch distributed: one XA session per sink partition
    * (the reference's processor-owns-its-XAResource scheme), deterministic
    * repartition to a fixed width for replay-stable partition contents —
    * same contract as [[KafkaShapedSink.writeBatch]].
    */
  def writeBatch(rmName: String, job: String, queue: String, batchId: Long,
                 batch: DataFrame, parts: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    batch.repartition(parts, batch.columns.map(col).toIndexedSeq: _*)
      .toJSON.foreachPartition { (it: Iterator[String]) =>
        val pid = TaskContext.getPartitionId()
        val session = InMemoryXaResourceManager.named(rmName)
          .session(s"$job-p$pid")
        XaShapedSink.deliverPartition(session.xaResource,
          session.send(queue, _), job, pid, batchId, it)
        ()
      }
  }

  /** Exactly-once XA-shaped stream sink: 2PC per micro-batch per partition,
    * visibility lagging one batch (Jet's one-snapshot lag). Pair with a
    * checkpoint so batch ids replay deterministically.
    */
  def sink(rmName: String, job: String, queue: String,
           checkpoint: Option[String] = None, parts: Int = 8): StreamSink =
    StreamSinks.foreachBatch(
      (batch, id) => writeBatch(rmName, job, queue, id, batch, parts),
      outputMode = "append", checkpoint = checkpoint)
}

/** In-JVM XA resource manager with the semantics the protocol leans on:
  * ACTIVE/ENDED transactions die with their session (a real RM rolls
  * un-prepared work back when the connection drops); PREPARED transactions
  * are durable and appear in `recover()` from ANY session; commit makes a
  * transaction's messages visible on its queue; XAER_NOTA for unknown xids,
  * XAER_DUPID for reused ones. One instance per name via the registry —
  * reachable from executor threads in local mode.
  */
final class InMemoryXaResourceManager {

  private final case class Msg(queue: String, value: String)
  private final class Txn(val xid: Xid) {
    val msgs = scala.collection.mutable.ArrayBuffer.empty[Msg]
    var state: String = "active" // active -> ended -> prepared
    var owner: String = ""
  }

  private def key(x: Xid): String =
    x.getFormatId + ":" + java.util.Base64.getEncoder.encodeToString(
      x.getGlobalTransactionId)

  private val txns = scala.collection.mutable.LinkedHashMap.empty[String, Txn]
  private val visibleMsgs = scala.collection.mutable.ArrayBuffer.empty[Msg]

  /** Messages a consumer of `queue` sees (committed only). */
  def visible(queue: String): Seq[String] = synchronized {
    visibleMsgs.collect { case Msg(`queue`, v) => v }.toSeq
  }

  /** Simulated process death of a session: every ACTIVE/ENDED transaction
    * it owns rolls back (the RM behavior on connection loss); PREPARED
    * transactions survive — the XA property the protocol is built on.
    */
  def crashSession(sessionId: String): Unit = synchronized {
    val dead = txns.collect {
      case (k, t) if t.owner == sessionId && t.state != "prepared" => k
    }.toSeq
    dead.foreach(txns.remove)
    ()
  }

  final class Session(val id: String) {
    private var current: Option[Txn] = None

    /** JMS-session send: only valid inside a started transaction. */
    def send(queue: String, value: String): Unit =
      InMemoryXaResourceManager.this.synchronized {
        val t = current.filter(_.state == "active").getOrElse(
          throw new IllegalStateException("send outside an active XA transaction"))
        t.msgs += Msg(queue, value)
        ()
      }

    val xaResource: XAResource = new XAResource {
      override def start(xid: Xid, flags: Int): Unit =
        InMemoryXaResourceManager.this.synchronized {
          if (txns.contains(key(xid)))
            throw new XAException(XAException.XAER_DUPID)
          val t = new Txn(xid)
          t.owner = id
          txns(key(xid)) = t
          current = Some(t)
        }
      override def end(xid: Xid, flags: Int): Unit =
        InMemoryXaResourceManager.this.synchronized {
          txns.get(key(xid)).foreach(_.state = "ended")
          current = None
        }
      override def prepare(xid: Xid): Int =
        InMemoryXaResourceManager.this.synchronized {
          val t = txns.getOrElse(key(xid),
            throw new XAException(XAException.XAER_NOTA))
          t.state = "prepared"
          XAResource.XA_OK
        }
      override def commit(xid: Xid, onePhase: Boolean): Unit =
        InMemoryXaResourceManager.this.synchronized {
          val t = txns.getOrElse(key(xid),
            throw new XAException(XAException.XAER_NOTA))
          visibleMsgs ++= t.msgs
          txns.remove(key(xid))
          ()
        }
      override def rollback(xid: Xid): Unit =
        InMemoryXaResourceManager.this.synchronized {
          if (txns.remove(key(xid)).isEmpty)
            throw new XAException(XAException.XAER_NOTA)
          ()
        }
      override def recover(flag: Int): Array[Xid] =
        InMemoryXaResourceManager.this.synchronized {
          txns.values.filter(_.state == "prepared").map(_.xid).toArray
        }
      override def forget(xid: Xid): Unit = ()
      override def getTransactionTimeout: Int = 0
      override def setTransactionTimeout(seconds: Int): Boolean = false
      override def isSameRM(xares: XAResource): Boolean = false
    }
  }

  def session(id: String): Session = new Session(id)
}

object InMemoryXaResourceManager {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryXaResourceManager]()
  def named(name: String): InMemoryXaResourceManager =
    registry.computeIfAbsent(name, _ => new InMemoryXaResourceManager)
}
