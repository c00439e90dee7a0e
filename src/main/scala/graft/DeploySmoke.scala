package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deploy-packaging gate (VERDICT r14 item 4): proves the PACKAGED jar runs
  * under `spark-submit` — including a real multi-executor master
  * (`local-cluster[2,2,...]`), which exercises the process boundary that
  * `local[n]` never does: closures, Encoders, the Catalyst extensions
  * registration, DSv2 sources, and state-store providers all serialize to
  * separate executor JVMs. Mirrors the reference's distribution story
  * (hazelcast-jet-distribution/: a user downloads a package and submits
  * jobs to a real cluster, not an embedded instance).
  *
  * Two-query gate on the given sf dir:
  *
  *  - BATCH: the flagship q01 pricing summary, canonical-hashed;
  *  - STREAMING: keyed tumbling-window agg over a file-stream replay of the
  *    events fixture (16 chunk files, one per micro-batch) with a REAL
  *    checkpoint — the query is STOPPED after ≥2 batches and RESTARTED from
  *    the checkpoint (complete mode re-emits the restored state, so a lost
  *    or doubled batch changes the hash). The result must equal the same
  *    aggregation computed as a batch query in the same session: the
  *    internal oracle that the restart lost nothing.
  *
  * Prints one JSON line; `scripts/deploy_smoke.sh` runs this main under
  * local[4] AND local-cluster[2,2,*] and asserts the hashes MATCH across
  * deployment modes (rows > 0, stream == batch inside each mode).
  *
  * Usage: spark-submit --class graft.DeploySmoke <jar> <sfDir> <workDir>
  */
object DeploySmoke {

  /** Order-insensitive canonical hash: every row rendered as a \u0001-joined
    * string, rows sorted, md5 over the concatenation. Stable across
    * partitionings, masters, and JVMs (Java's Double/Timestamp toString are
    * deterministic).
    */
  private def canonicalHash(df: DataFrame): (Long, String) = {
    val rows = df.collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0001")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update((r + "\n").getBytes("UTF-8")))
    (rows.length.toLong, md.digest().map(b => f"$b%02x").mkString)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DeploySmoke <sfDir> <workDir>")
    val (sfDir, work) = (args(0), args(1))
    // no .master(): spark-submit supplies it — that's the point of the gate
    val spark = GraftSession.tune(SparkSession.builder().appName("graft-deploy-smoke"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- batch gate: the flagship, end to end through the packaged jar
    val (q01Rows, q01Hash) =
      canonicalHash(queries.QueryRegistry.all("q01_pricing_summary")(spark, sfDir))

    // ---- streaming gate: replay -> windowed agg -> stop -> resume
    val events = Tables(spark, sfDir, "events").select($"ts", $"event_type", $"value")
    // hash-partitioned chunking (deterministic regardless of input splits,
    // unlike round-robin) — 16 files, one micro-batch each, so the mid-
    // replay stop at batch ≥2 always leaves work for the resumed query
    Tables(spark, sfDir, "events")
      .repartition(16, $"event_id")
      .select($"ts", $"event_type", $"value")
      .write.mode("overwrite").parquet(s"$work/in")
    val ckpt = s"$work/ckpt"
    // round(sum,4): double addition is non-associative, and the partial-agg
    // fold order differs across masters (measured: local[4] vs local-cluster
    // hashes split on the sum's LOW BITS with identical rows) — the gate
    // compares SEMANTICS across deployments, not float bit patterns; 4
    // decimals is ~6 orders above the accumulation noise at this data scale
    def startStream() = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .writeStream.format("memory").queryName("deploy_stream")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    val q1 = startStream()
    // stop mid-replay: after ≥2 committed batches, with ≥14 files still unread.
    // Bounded wait + exception rethrow: a stream that fails at startup (bad sf
    // dir, checkpoint error) must fail the gate loudly, not hang it forever.
    var preBatches = -1L
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (preBatches < 2) {
      q1.exception.foreach(throw _)
      if (System.nanoTime() > deadline)
        sys.error(s"[deploy-smoke] stream stuck: $preBatches batches after 120 s")
      Thread.sleep(20)
      preBatches = Option(q1.lastProgress).map(_.batchId).getOrElse(-1L)
    }
    q1.stop()
    // restart from the checkpoint; complete mode re-emits the full restored
    // state with the remaining batches folded in
    val q2 = startStream()
    q2.processAllAvailable()
    val postBatches = Option(q2.lastProgress).map(_.batchId).getOrElse(-1L)
    q2.stop()
    val streamResult = spark.table("deploy_stream")
    val (streamRows, streamHash) = canonicalHash(streamResult)

    // internal oracle: the restarted stream must equal the batch plan
    val batchTwin = events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
    val (batchRows, batchHash) = canonicalHash(batchTwin)
    val streamEqualsBatch = streamRows == batchRows && streamHash == batchHash

    println(s"""{"metric":"deploy_smoke","master":"${spark.sparkContext.master}",""" +
      s""""q01_rows":$q01Rows,"q01_hash":"$q01Hash",""" +
      s""""stream_rows":$streamRows,"stream_hash":"$streamHash",""" +
      s""""stream_equals_batch":$streamEqualsBatch,""" +
      s""""restart_batches":[$preBatches,$postBatches]}""")
    spark.stop()
    if (q01Rows == 0 || streamRows == 0 || !streamEqualsBatch || postBatches <= preBatches) {
      System.err.println("[deploy-smoke] FAILED (zero rows, stream!=batch, " +
        "or the restart processed nothing)")
      sys.exit(1)
    }
  }
}
