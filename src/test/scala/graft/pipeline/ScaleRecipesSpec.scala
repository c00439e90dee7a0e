package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB recipes as executable tests: salted aggregation for skewed keys
  * and bucketed co-located joins (shuffle elimination). These are the
  * Spark-native answers to the reference's partitioned edges
  * (core/Edge.java:659-709) and its lack of skew handling.
  */
class ScaleRecipesSpec extends SparkSpec {

  import spark.implicits._

  test("salted exact-distinct aggregation equals the unsalted result") {
    // skewed: key "hot" carries 10k values, others 10
    val rows = (1 to 10000).map(i => ("hot", s"u${i % 997}")) ++
      (1 to 10).map(i => ("cold", s"u$i"))
    val df = rows.toDF("k", "user")

    val exact = df.groupBy($"k").agg(count_distinct($"user").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val salted = new BatchStage(df).groupingKey($"k")
      .aggregateSalted(
        saltOn = $"user",
        partial = AggOp(Seq(count_distinct($"user").as("nd_part"))),
        merge = AggOp(Seq(sum($"nd_part").as("nd"))),
        salts = 16)
      .toDF.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(salted === exact)
    assert(salted("hot") === 997L && salted("cold") === 10L)
  }

  test("salted join equals the plain join and shuffles on (key, salt)") {
    // skewed fact: one hot key with 5k rows; modest right side (not broadcast)
    val facts = ((1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("k", "fv")
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"d$i") }.toDF("k", "dv")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = facts.join(dim, Seq("k"), "inner")
        .collect().map(_.toSeq).toSet
      val saltedStage = new BatchStage(facts)
        .saltedJoin(new BatchStage(dim), Seq("k"), salts = 8)
      assert(saltedStage.toDF.collect().map(_.toSeq).toSet === plain)
      // the exchange must hash on the salt too — that's the skew spread
      val plan = saltedStage.toDF.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt column not in the shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed tables join without a shuffle exchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "lv")
    val right = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("id", "rv")
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    left.write.bucketBy(8, "id").sortBy("id").saveAsTable("bkt_left")
    right.write.bucketBy(8, "id").sortBy("id").saveAsTable("bkt_right")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: both sides scan pre-partitioned buckets, no
      // Exchange (Jet's PARTITIONED distributed edge, paid once at write time)
      assert(!plan.contains("Exchange hashpartitioning"), s"shuffle in:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("LSH mega-bucket chains instead of exploding quadratically") {
    import graft.functions.DedupFunctions
    // 1000 docs with IDENTICAL token sets — every band hashes them into the
    // same bucket, the quadratic path would emit ~499,500 pairs per band
    val docs = (1L to 1000L).map(i => (i, Seq("the", "same", "boilerplate", "text")))
      .toDF("doc_id", "toks")
    val pairs = DedupFunctions.candidatePairs(
      docs, "doc_id", "toks", hashes = 12, bands = 2, minJaccard = 0.9,
      maxBucket = 100)
    val n = pairs.count()
    // chained: exactly n−1 rank-adjacent pairs (identical docs ⇒ jaccard 1.0)
    assert(n === 999L, s"expected bounded chain fan-out, got $n pairs")
    // the chain keeps the whole bucket in ONE component for clustering
    val labels = DedupFunctions.connectedComponents(
      pairs.select($"id_a", $"id_b"), "id_a", "id_b")
    assert(labels.select("label").distinct().count() === 1L)
    pairs.unpersist()

    // below the cap the all-pairs path is untouched: 5 identical docs,
    // maxBucket default ⇒ full 5·4/2 = 10 pairs
    val small = (1L to 5L).map(i => (i, Seq("alpha", "beta", "gamma", "delta")))
      .toDF("doc_id", "toks")
    val fullPairs = DedupFunctions.candidatePairs(
      small, "doc_id", "toks", hashes = 12, bands = 2, minJaccard = 0.9)
    assert(fullPairs.count() === 10L)
    fullPairs.unpersist()
  }
}
