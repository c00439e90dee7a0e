package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's in-repo microbenchmark as a correctness test (SURVEY §5.5 —
  * benchmark/WordCountTest.java:76-84,215-254: 1 M rows × 20 words drawn from
  * 100 k distinct, EXACT counts asserted). Same data shape, generated
  * distributed (no driver-side materialization), counts asserted exactly.
  */
class WordCountBenchSpec extends SparkSpec {

  import spark.implicits._

  test("1M rows x 20 words, 100k distinct: exact counts (WordCountTest parity)") {
    val rows = 1000000L
    val wordsPerRow = 20
    val distinct = 100000L
    // row i, slot j -> word ((i * 20 + j) mod 100k): every word appears exactly
    // (rows * 20 / 100k) = 200 times, verifiable without a reference run
    val lines = spark.range(rows).select(
      concat_ws(" ", (0 until wordsPerRow).map(j =>
        concat(lit("w"), pmod($"id" * wordsPerRow + j, lit(distinct)))): _*).as("line"))

    val counts = lines
      .select(explode(split($"line", " ")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_words"), min($"n").as("mn"), max($"n").as("mx"),
        sum($"n").as("total"))
      .collect().head

    assert(counts.getLong(0) === distinct)                 // all 100k words seen
    assert(counts.getLong(1) === 200L && counts.getLong(2) === 200L) // exact per-word count
    assert(counts.getLong(3) === rows * wordsPerRow)       // no row lost or duplicated
  }
}
