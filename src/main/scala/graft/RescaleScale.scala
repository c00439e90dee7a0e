package graft

import graft.pipeline.{StatefulOps, StreamSinks}
import graft.streaming.StateRescale
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Scale measurement behind the q173 rescale gate (VERDICT r12 item 7):
  * q173 itself exercises the full suspend → CREATE SNAPSHOT → resume
  * lifecycle at a FIXED small state (1000 values, width 4→9); this main
  * measures the offline `StateRescale.rewrite` — the only part whose cost
  * grows with state — at two state cardinalities and two width changes,
  * then restarts each rewritten checkpoint and requires the keyed totals
  * to converge exactly.
  *
  * The rewrite reads every state row once through the `statestore` source,
  * reshuffles by the new `pmod(murmur3, width)` routing, and writes one
  * snapshot file per new partition — O(state) with one shuffle, so the
  * expected shape is ~linear in state rows and ~flat in the width delta.
  *
  * Usage: sbt "runMain graft.RescaleScale [keys1,keys2,...]"
  */
object RescaleScale {

  def main(args: Array[String]): Unit = {
    val cardinalities =
      if (args.nonEmpty) args(0).split(",").map(_.trim.toLong).toSeq
      else Seq(1000L, 500000L)
    val spark = GraftSession.tune(
      SparkSession.builder().master("local[32]").appName("graft-rescale-scale"),
      shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val results = cardinalities.flatMap { keys =>
      val dir = Files.createTempDirectory(s"graft_rescale_scale_$keys").toString
      val (out, ckpt) = (s"$dir/out", s"$dir/ckpt")
      val mem = MemoryStream[(String, Long)]
      def agg() =
        StatefulOps.rollingAggregate[String, (String, Long), Long, (String, Long)](
          mem.toDS(), _._1, zero = 0L,
          accumulate = (acc, v) => acc + v._2,
          export = (k, acc) => (k, acc)).toDF("k", "running")

      spark.conf.set("spark.sql.shuffle.partitions", "4")
      // two batches so the state file chain has deltas, like a real job
      mem.addData((0L until keys).map(i => (s"k$i", 1L)): _*)
      val job = StreamSinks.files(out, ckpt).start(agg())
      job.processAllAvailable()
      mem.addData((0L until keys by 2L).map(i => (s"k$i", 10L)): _*)
      job.query.processAllAvailable()
      job.cancel() // batch-aligned stop: nothing in flight after processAllAvailable

      Seq(9, 32).map { newWidth =>
        val target = s"$dir/ckpt_w$newWidth"
        val t0 = System.nanoTime()
        StateRescale.rewrite(spark, ckpt, target, newWidth)
        val dt = (System.nanoTime() - t0) / 1e9

        // teeth: resume from the rewritten checkpoint and verify exact totals
        spark.conf.set("spark.sql.shuffle.partitions", newWidth.toString)
        mem.addData(("probe", 5L))
        val resumed = StreamSinks.files(out, s"$target").start(agg())
        resumed.query.processAllAvailable()
        val width = resumed.query.lastProgress.stateOperators
          .asInstanceOf[Array[_]].head
          .asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
          .numShufflePartitions
        resumed.cancel()
        require(width == newWidth, s"resumed at width $width, wanted $newWidth")
        val rows = spark.read.parquet(out).as[(String, Long)]
          .groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).max)).collect()
        val expect = keys + (keys + 1) / 2 * 10
        val got = rows.filter(_._1 != "probe").map(_._2).sum
        require(got == expect,
          s"keys=$keys width=$newWidth: totals diverged after rescale: $got != $expect")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        val label = s"keys=${keys}_4to$newWidth"
        System.err.println(f"[rescale-scale] $label rewrite=${dt}%.2fs (verified)")
        label -> dt
      }
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"rescale_scale","rewrite_sec":$qs}""")
    spark.stop()
  }
}
