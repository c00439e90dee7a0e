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
