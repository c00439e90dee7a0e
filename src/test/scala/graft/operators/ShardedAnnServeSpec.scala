package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Plan + semantics pins for the PARTITIONED ANN serving index
  * ([[IvfShardedServe]], gate q165). The whole point of the sharded form is
  * what the plan does NOT contain — a corpus-sized broadcast — so these
  * tests assert plan shape, not just rows.
  */
class ShardedAnnServeSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb =
    Tables(spark, sf, "embeddings").select($"vec_id", $"embedding", $"label")
  private lazy val bBits = IvfShardedServe.bBitsFor(emb.count())
  private lazy val postings = IvfShardedServe.buildPostings(emb, bBits)
  private lazy val cents = IvfShardedServe.buildCentroids(postings)

  /** Batch probe rows shaped like the streaming probe stage's output. */
  private def batchProbes() = {
    val local = cents
    val centDf = local.map { case (c, m) => (c, m.toSeq) }.toSeq
      .toDF("cell", "cv")
    // probe with plain SQL against the centroid table (batch twin of the
    // in-stream service): rank by round(cos, 9) DESC, cell ASC, take 2.
    // Fresh scan — the streaming form's probe side exits a mapPartitions
    // stage, so no self-join lineage exists there; mirror that here.
    val q = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .filter($"vec_id" % 40 === 1)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    import graft.functions.SimilarityFunctions.{dotAuto, toDouble}
    val qn = sqrt(dotAuto(toDouble($"qv"), toDouble($"qv")))
    import org.apache.spark.sql.expressions.Window
    q.withColumn("qn", qn)
      .crossJoin(broadcast(centDf))
      .withColumn("c", dotAuto(toDouble($"qv"), toDouble($"cv")) /
        ($"qn" * sqrt(dotAuto($"cv", $"cv"))))
      .withColumn("rn", row_number().over(Window.partitionBy($"query_id")
        .orderBy(round($"c", 9).desc, $"cell".asc)))
      .filter($"rn" <= 2)
      .withColumn("ts", timestamp_seconds($"query_id"))
      .select($"ts", $"query_id", $"qv", $"qn", $"cell".as("probe_cell"))
      // materialize: the serving plan under test starts from the probe rows
      // (in the streaming form they exit the service stage), not from this
      // batch twin's own centroid-broadcast construction
      .localCheckpoint()
  }

  test("serveProbed plan: shuffle-hash join on cell, NO broadcast of the postings") {
    val probes = batchProbes()
    val served = IvfShardedServe.serveProbed(probes, postings, k = 5)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-hash join on cell id, got:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"the sharded plan must not broadcast the corpus:\n$plan")
  }

  test("bucketed posting table: the static join side reads pre-hashed buckets, no exchange") {
    val table = "graft_spec_ann_postings"
    val bucketed = IvfShardedServe.postingsAsBucketedTable(
      postings, table, buckets = 4)
    val probes = batchProbes()
    val served = IvfShardedServe.serveProbed(probes, bucketed, k = 5)
    val plan = served.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"))
    // only the PROBE side shuffles into the join: the postings side scans
    // pre-hashed buckets directly (Bucketed: true, no Exchange on cell) —
    // this is the per-micro-batch plan a 100 TB index runs, where
    // re-shuffling the corpus every batch would be fatal. (The remaining
    // exchange above the join is the answer-sized top-k aggregation.)
    val joinSection = plan.split("ShuffledHashJoin")(1)
    assert(joinSection.contains("Bucketed: true"),
      s"postings must come from the bucketed scan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(probe_cell"),
      s"probe rows route to the bucket layout:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(cell"),
      s"the postings side must have NO exchange — bucketing satisfies the join:\n$plan")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("sharded serving matches the in-service q162 result exactly") {
    val a = graft.queries.StreamingQueries.q162_stream_ann_ivf_serve(spark, sf)
      .orderBy($"query_id", $"rank").collect().toSeq
    val b = graft.queries.StreamingQueries.q165_stream_ann_ivf_shard(spark, sf)
      .orderBy($"query_id", $"rank").collect().toSeq
    assert(a == b, "broadcast and partitioned forms must agree row-for-row")
  }

  test("graft_topk: bounded, 9-dp-quantized ordering with id tiebreak, merge-safe") {
    val df = Seq(
      (1L, 0.5000000001, 10L), // quantizes to 0.500000000
      (1L, 0.5000000004, 11L), // also 0.500000000 -> tie, id order
      (1L, 0.9, 12L),
      (1L, 0.1, 13L),
      (1L, 0.9, 9L), // exact tie with 12 -> lower id first
      (2L, 0.3, 20L))
      .toDF("g", "score", "id")
      .repartition(4) // force partial/merge path
    val out = df.groupBy($"g")
      .agg(IvfShardedServe.topkColumn($"score", $"id", 3).as("topk"))
      .select($"g", posexplode($"topk").as(Seq("pos", "t")))
      .select($"g", $"pos", $"t.id".as("id"))
      .orderBy($"g", $"pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(
      (1L, 0, 9L), (1L, 1, 12L), (1L, 2, 10L), // 0.9/9, 0.9/12, then tie 10<11
      (2L, 0, 20L)))
  }

  test("graft_topk rejects non-positive k at analysis time") {
    val df = Seq((1L, 0.5, 10L)).toDF("g", "score", "id")
    for (k <- Seq(0, -3)) {
      val ex = intercept[Exception] {
        df.groupBy($"g")
          .agg(IvfShardedServe.topkColumn($"score", $"id", k).as("topk"))
          .collect()
      }
      assert(ex.getMessage.toLowerCase.contains("k > 0"),
        s"k=$k must fail type-check, got: ${ex.getMessage.take(200)}")
    }
  }

  test("graft_topk buffer serialize/deserialize round-trips (streaming-state path)") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    val agg = graft.functions.expr.TopKScored(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      Literal(2, IntegerType))
    val buf = agg.createAggregationBuffer()
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    Seq((0.7, 1L), (0.9, 2L), (0.8, 3L)).foreach { case (s0, i0) =>
      row.update(0, s0); row.update(1, i0)
      agg.update(buf, row)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size == 2)
    assert((back.scores(0), back.ids(0)) == (0.9, 2L))
    assert((back.scores(1), back.ids(1)) == (0.8, 3L))
    // merge a deserialized buffer into a fresh one (the combine path)
    val buf2 = agg.createAggregationBuffer()
    row.update(0, 0.85); row.update(1, 4L)
    agg.update(buf2, row)
    val merged = agg.merge(buf2, back)
    assert((merged.scores(0), merged.ids(0)) == (0.9, 2L))
    assert((merged.scores(1), merged.ids(1)) == (0.85, 4L))
  }
}
