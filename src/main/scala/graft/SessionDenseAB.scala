package graft

import graft.core._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** A/B behind the two-stage session topology's design note (round 13): on the
  * gate fixture the pre-merge cannot compress (sessions average ~1 event —
  * fragments ≈ events, ShuffleAudit measured identical 901.5 MB), so this
  * main measures the DENSE-session regime the pre-merge exists for: K keys ×
  * S sessions × E events per session, events interleaved time-ordered per
  * partition. Each session spans ~E time units, the watermark throttles at
  * the session timeout, so the pre-merge flushes ~E/timeout fragments per
  * session where the single-stage form shuffles all E events — the expected
  * row compression is ~timeout/1 per interval.
  *
  * Prints one JSON line with shuffle bytes + wall for both topologies and
  * asserts both produce the identical session set (the same equivalence
  * DagCoreSpec pins at unit scale).
  */
object SessionDenseAB {

  /** The dense fixture: K keys × S sessions × E events per session, events
    * interleaved time-ordered per partition (the bounded-disorder source
    * contract). Shared with ScaleTrend's dense-session growth row — S is the
    * axis the replica factor scales.
    */
  def denseEvents(sc: org.apache.spark.SparkContext, sessionsPerKey: Int,
                  keys: Int = 96, eventsPerSession: Int = 240,
                  parts: Int = 8): RDD[Any] =
    sc.parallelize(0 until parts, parts).flatMap { p =>
      val local = (p * keys / parts) until ((p + 1) * keys / parts)
      for {
        s <- (0 until sessionsPerKey).iterator
        j <- (0 until eventsPerSession).iterator
        k <- local.iterator
      } yield (s * 100000L + j, s"k$k").asInstanceOf[Any]
    }

  /** Time the SHIPPED (two-stage preMerge + combineFragments) topology over
    * the dense fixture; returns (seconds, distinct sessions emitted) and
    * asserts the expected session count — a growth row that silently
    * under-merged would otherwise read as a win.
    */
  def timeTwoStage(spark: SparkSession, sessionsPerKey: Int,
                   keys: Int = 96): (Double, Int) = {
    val timeout = 30L
    val parts = 8
    val dag = new DAG
    val wm = dag.newVertex("wm",
      Processors.insertWatermarksP[(Long, String)](
        _._1, lag = timeout, throttleFrame = timeout))
      .localParallelism(parts)
    val pre = dag.newVertex("premerge",
      Processors.sessionPreMergeP[String, Long](
        timeout, _.asInstanceOf[(Long, String)]._1,
        _.asInstanceOf[(Long, String)]._2, AggregateOp.counting))
      .localParallelism(parts)
    val sess = dag.newVertex("session",
      Processors.combineSessionFragmentsP[String, Long, Long](
        AggregateOp.counting, (s, e, k, n) => (s, e, k, n)))
    dag
      .edge(Edge.between(wm, pre))
      .edge(Edge.between(pre, sess)
        .partitioned(_.asInstanceOf[(Long, Long, String, Long)]._3)
        .distributed())
    val events = denseEvents(spark.sparkContext, sessionsPerKey, keys)
    val t0 = System.nanoTime()
    val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> events))("session")
    val dt = (System.nanoTime() - t0) / 1e9
    val n = out.size
    require(n == keys * sessionsPerKey,
      s"expected ${keys * sessionsPerKey} sessions, got $n")
    (dt, n)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("graft-session-ab"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val K = 96 // keys (12 per input partition)
    val S = 40 // sessions per key
    val E = 240 // events per session
    val timeout = 30L
    val parts = 8
    // partition p owns keys [p*K/parts, (p+1)*K/parts); time-ordered within
    // the partition: for each session s and time step j, emit every local
    // key's event — the bounded-disorder source contract the DAG assumes
    val events: RDD[Any] = sc.parallelize(0 until parts, parts).flatMap { p =>
      val keys = (p * K / parts) until ((p + 1) * K / parts)
      for {
        s <- (0 until S).iterator
        j <- (0 until E).iterator
        k <- keys.iterator
      } yield (s * 100000L + j, s"k$k").asInstanceOf[Any]
    }

    val shufWrite = new AtomicLong
    sc.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shufWrite.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def run(twoStage: Boolean): (Set[(Long, Long, String, Long)], Double, Long) = {
      val dag = new DAG
      val wm = dag.newVertex("wm",
        Processors.insertWatermarksP[(Long, String)](
          _._1, lag = timeout, throttleFrame = timeout))
        .localParallelism(parts)
      val counting = AggregateOp.counting
      if (twoStage) {
        val pre = dag.newVertex("premerge",
          Processors.sessionPreMergeP[String, Long](
            timeout, _.asInstanceOf[(Long, String)]._1,
            _.asInstanceOf[(Long, String)]._2, counting))
          .localParallelism(parts)
        val sess = dag.newVertex("session",
          Processors.combineSessionFragmentsP[String, Long, Long](
            counting, (s, e, k, n) => (s, e, k, n)))
        dag
          .edge(Edge.between(wm, pre))
          .edge(Edge.between(pre, sess)
            .partitioned(_.asInstanceOf[(Long, Long, String, Long)]._3)
            .distributed())
      } else {
        val sess = dag.newVertex("session",
          Processors.aggregateToSessionWindowP[String, Long, Long](
            timeout, _.asInstanceOf[(Long, String)]._1,
            _.asInstanceOf[(Long, String)]._2, counting,
            (s, e, k, n) => (s, e, k, n)))
        dag.edge(Edge.between(wm, sess)
          .partitioned(_.asInstanceOf[(Long, String)]._2).distributed())
      }
      shufWrite.set(0)
      val t0 = System.nanoTime()
      val out = DagExecutor.execute(spark, dag, inputs = Map("wm" -> events))("session")
        .map(_.asInstanceOf[(Long, Long, String, Long)]).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener events drain async
      (out, dt, shufWrite.get)
    }

    run(twoStage = false) // warm JVM/codegen once
    val (one, oneSec, oneBytes) = run(twoStage = false)
    val (two, twoSec, twoBytes) = run(twoStage = true)
    require(one == two, s"topologies diverged: ${one.size} vs ${two.size} sessions")
    require(one.size == K * S, s"expected ${K * S} sessions, got ${one.size}")
    println(
      s"""{"metric":"session_dense_ab","events":${K.toLong * S * E},"sessions":${K * S},""" +
      s""""single_stage":{"sec":$oneSec,"shuffle_bytes":$oneBytes},""" +
      s""""two_stage":{"sec":$twoSec,"shuffle_bytes":$twoBytes},""" +
      s""""bytes_ratio":${oneBytes.toDouble / math.max(twoBytes, 1)}}""")
    spark.stop()
  }
}
