package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral pins for the q97–q100 curation batch (the DuckDB oracle is the
  * value gate; these pin the properties the oracle can't see — greedy
  * maximality, chunk overlap algebra, and the zero-shuffle chunking plan).
  */
class CurationSpec extends SparkSpec {

  test("q97 token budget: kept set is the maximal greedy prefix per source") {
    import spark.implicits._
    val kept = CurationQueries.q97_token_budget(spark, sf).cache()
    // every kept row is within budget
    assert(kept.filter($"cum_tokens" > 800).count() == 0)
    // maximality: per source, adding the first DROPPED doc (in the same
    // priority order) would exceed the budget — the fill is tight, not lazy
    val docs = graft.Tables(spark, sf, "documents")
      .select($"source", $"doc_id",
        size(graft.functions.TextFunctions.tokens($"text")).cast("long").as("n_tokens"))
    val keptMax = kept.groupBy($"source")
      .agg(sum($"n_tokens").as("kept_tokens"))
    val firstDropped = docs.join(kept.select($"doc_id", lit(1).as("k")),
        Seq("doc_id"), "left")
      .filter($"k".isNull)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")
          .orderBy($"n_tokens".desc, $"doc_id")))
      .filter($"rn" === 1)
    val viol = firstDropped.join(keptMax, "source")
      .filter($"kept_tokens" + $"n_tokens" <= 800)
    assert(viol.count() == 0,
      "a dropped doc would still have fit the budget — fill is not maximal")
    kept.unpersist()
  }

  test("q98 chunking: stride-48/window-64 overlap algebra holds") {
    import spark.implicits._
    val chunks = CurationQueries.q98_chunking(spark, sf).cache()
    // chunk sizes: ≤64 always; every non-final chunk is exactly 64 when the
    // doc has enough tokens — i.e. only the LAST chunk per doc may be short
    assert(chunks.filter($"n_chunk_tokens" > 64).count() == 0)
    val short = chunks.withColumn("maxId", max($"chunk_id").over(
      org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .filter($"n_chunk_tokens" < 64 && $"chunk_id" < $"maxId")
    assert(short.count() == 0, "a non-final chunk is short")
    // overlap: chunk i's tokens [49..64] == chunk i+1's tokens [1..16]
    // (stride 48 on a 64-token window leaves a 16-token shared region)
    val a = chunks.filter($"n_chunk_tokens" === 64)
      .select($"doc_id", $"chunk_id",
        slice(split($"chunk_text", " "), 49, 16).as("tailToks"))
    val b = chunks.select($"doc_id", ($"chunk_id" - 1).as("chunk_id"),
      slice(split($"chunk_text", " "), 1, 16).as("headToks"))
    val mism = a.join(b, Seq("doc_id", "chunk_id"))
      .filter(not($"tailToks" === $"headToks"))
    assert(mism.count() == 0, "overlap region mismatch between chunks")
    chunks.unpersist()
  }

  test("q98 chunking plan is narrow: zero Exchange") {
    val plan = CurationQueries.q98_chunking(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"chunking should be a pure narrow pipeline:\n$plan")
  }

  test("q101 shards: positions dense per shard, assignment deterministic") {
    import spark.implicits._
    val a = CurationQueries.q101_shard_assign(spark, sf).cache()
    // dense ordinals: per shard, positions are exactly 0..count-1
    val holes = a.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos_in_shard").as("mx"),
        min($"pos_in_shard").as("mn"))
      .filter($"mx" =!= $"n" - 1 || $"mn" =!= 0)
    assert(holes.count() == 0, "pos_in_shard is not dense 0..n-1")
    // every doc appears exactly once
    assert(a.select($"doc_id").distinct().count() == a.count())
    // deterministic: a second evaluation assigns identical (shard, pos)
    val b = CurationQueries.q101_shard_assign(spark, sf)
    val diff = a.join(b.withColumnRenamed("shard", "s2")
        .withColumnRenamed("pos_in_shard", "p2"), "doc_id")
      .filter($"shard" =!= $"s2" || $"pos_in_shard" =!= $"p2")
    assert(diff.count() == 0, "shard assignment is not reproducible")
    // md5-balanced: no shard holds more than 3x its fair share
    val n = a.count()
    val worst = a.groupBy($"shard").count()
      .agg(max($"count")).head().getLong(0)
    assert(worst <= 3 * n / 8 + 1, s"shard skew: worst=$worst of $n")
    a.unpersist()
  }

  test("q102 adaptive quality: exact 60% cut, kept dominate dropped") {
    import spark.implicits._
    val kept = CurationQueries.q102_adaptive_quality(spark, sf).cache()
    val all = graft.Tables(spark, sf, "documents")
      .select($"source", $"doc_id",
        size(array_distinct(graft.functions.TextFunctions.tokens($"text")))
          .as("n_distinct"))
    // per source: kept count == floor(0.6 * total) (rank*10 <= cnt*6)
    val counts = all.groupBy($"source").agg(count(lit(1)).as("total"))
      .join(kept.groupBy($"source").agg(count(lit(1)).as("k")), "source")
      .filter($"k" =!= floor($"total" * 6 / 10))
    assert(counts.count() == 0, "kept count is not the exact 60% cut")
    // dominance: kept is a PREFIX of the (n_distinct DESC, doc_id ASC)
    // ranking — no dropped doc has a better rank key than any kept doc.
    // rank key = (-n_distinct, doc_id) ascending; violation iff some
    // dropped key < the worst (max) kept key in the same source
    val dropped = all.join(kept.select($"doc_id", lit(1).as("k")),
        Seq("doc_id"), "left").filter($"k".isNull)
    val worstKept = kept.groupBy($"source")
      .agg(max(struct((-$"n_distinct").as("neg"), $"doc_id".as("d"))).as("wk"))
    val viol = dropped.join(worstKept, "source")
      .filter(struct((-$"n_distinct").as("neg"), $"doc_id".as("d")) < $"wk")
    assert(viol.count() == 0, "a dropped doc outranks a kept doc")
    kept.unpersist()
  }

  test("q103 bigram LM: one bigram per adjacent token pair, scores negative") {
    import spark.implicits._
    val lm = CurationQueries.q103_bigram_logprob(spark, sf).cache()
    // every doc with >= 2 tokens appears with exactly n_tokens - 1 bigrams
    val toks = graft.Tables(spark, sf, "documents")
      .select($"doc_id",
        size(graft.functions.TextFunctions.tokens($"text")).as("n_tokens"))
    val joined = toks.filter($"n_tokens" >= 2)
      .join(lm, Seq("doc_id"), "full")
    assert(joined.filter($"n_bigrams".isNull || $"n_tokens".isNull).count() == 0,
      "doc set mismatch: q103 must cover exactly the docs with >= 2 tokens")
    assert(joined.filter($"n_bigrams" =!= $"n_tokens" - 1).count() == 0)
    // log of a probability in (0, 1]: every score is <= 0
    assert(lm.filter($"logprob2" > 0).count() == 0)
    lm.unpersist()
  }

  test("q104 hard negatives: labels always differ, ranks dense 1..5") {
    import spark.implicits._
    val hn = EmbeddingQueries.q104_hard_negatives(spark, sf).cache()
    val lbl = graft.Tables(spark, sf, "embeddings")
      .select($"vec_id".as("query_id"), $"label".as("qlabel"))
    assert(hn.join(lbl, "query_id").filter($"neg_label" === $"qlabel").count() == 0,
      "a hard negative shares the query's label")
    val ranks = hn.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), min($"rank").as("mn"), max($"rank").as("mx"))
      .filter($"n" =!= 5 || $"mn" =!= 1 || $"mx" =!= 5)
    assert(ranks.count() == 0, "ranks are not dense 1..5 per query")
    hn.unpersist()
  }

  test("q106 contrastive pairs: exactly chunks-minus-docs pairs, overlap real") {
    import spark.implicits._
    val chunks = CurationQueries.q98_chunking(spark, sf).cache()
    val pairs = CurationQueries.q106_contrastive_pairs(spark, sf)
    val expected = chunks.count() - chunks.select($"doc_id").distinct().count()
    assert(pairs.count() == expected,
      s"pair count != chunks - docs (${pairs.count()} vs $expected)")
    chunks.unpersist()
  }

  test("q100 vocab OOV: rates are in [0,1] and vocab hits dominate") {
    import spark.implicits._
    val oov = CurationQueries.q100_vocab_oov(spark, sf)
    assert(oov.filter($"oov_rate" < 0 || $"oov_rate" > 1).count() == 0)
    // top-50 vocab on a ~120-word synthetic corpus: most tokens must be
    // in-vocab (if not, the vocab cut or the join direction is broken)
    val agg = oov.agg(sum($"n_oov").as("o"), sum($"n_tokens").as("t"))
      .select(($"o".cast("double") / $"t").as("frac")).head().getDouble(0)
    assert(agg < 0.5, s"OOV fraction $agg implausibly high for top-50 vocab")
  }
}
