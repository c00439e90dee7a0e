package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact top-k heavy hitters with a shuffle-light candidate pass — the
  * frequent-items problem every corpus-statistics pipeline runs (vocabulary
  * heads, hot n-grams, dominant URLs).
  *
  * A naive exact top-k shuffles EVERY distinct key through a full hash
  * aggregation; at 100 TB the token key space is billions of rows of shuffle.
  * The classic sketch answer (CountMinSketch / SpaceSaving) is approximate;
  * this operator gets exact results with sketch-class shuffle volume:
  *
  *  1. one map-side pass computes per-partition local counts and emits only
  *     each partition's top `localM` tokens (plus the largest NON-emitted
  *     local count as that partition's miss bound) — no shuffle of the long
  *     tail, which in Zipf-distributed corpora is ~all of it;
  *  2. the union of emitted tokens (≤ partitions × localM rows) is the
  *     candidate set: any token absent from it has global count ≤ U = Σ per-
  *     partition miss bounds;
  *  3. a second pass exact-counts ONLY candidate tokens (broadcast semi-join
  *     → the groupBy shuffles candidate occurrences, not the tail);
  *  4. soundness gate: the k-th exact candidate count must be ≥ U — then no
  *     non-candidate can displace the top-k, and the result is provably the
  *     exact top-k. If the gate fails (adversarially flat distribution), fall
  *     back to the full exact aggregation rather than return a guess.
  *
  * `mapPartitions` is justified here (build-prompt ladder rung (d)): the
  * per-partition bounded-count structure is genuinely imperative state that no
  * composition of built-ins expresses without shuffling the tail.
  */
object HeavyHitters {

  /** Exact top-k (count desc, token asc tie-break) over a token dataset.
    * Returns columns (token, n) — deterministic for any input. NULL tokens
    * are ignored (dropped up front, like COUNT(col) semantics) — they would
    * otherwise be silently rejected by the candidate semi-join's
    * null-rejecting equality while still claiming certification.
    */
  def topK(tokens: Dataset[String], k: Int, localM: Int = 512): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    require(k > 0, "k must be positive")
    require(localM >= k, "localM must be >= k (candidates must be able to cover the top-k)")
    val toks = tokens.filter(t => t != null)

    // pass 1: local counts; emit (token, localCount) for the top localM plus
    // one (null, missBound) row per partition
    val local = toks.mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long]()
      it.foreach(t => counts.merge(t, 1L, (a, b) => a + b))
      if (counts.isEmpty) Iterator.empty
      else {
        import scala.jdk.CollectionConverters._
        val sorted = counts.entrySet().asScala.toArray
          .map(e => (e.getKey, e.getValue.longValue()))
          .sortBy { case (t, c) => (-c, t) }
        val top = sorted.iterator.take(localM)
          .map { case (t, c) => (t, c, false) }
        // the largest local count that was NOT emitted bounds every
        // non-candidate's contribution from this partition
        val miss = if (sorted.length > localM) sorted(localM)._2 else 0L
        top ++ Iterator((null: String, miss, true))
      }
    }.toDF("tok", "cnt", "is_bound").cache()

    // release the pass-1 cache even when an action below throws (executor
    // loss, OOM) — a docs-scale frame must never stay pinned in the session
    val (u, topRows) =
      try {
        val u0 = local.filter($"is_bound")
          .agg(coalesce(sum($"cnt"), lit(0L))).first().getLong(0)
        val cands = local.filter(!$"is_bound").select($"tok").distinct()
        // pass 2: exact-count candidates only; the broadcast semi-join keeps
        // the long tail out of the shuffle entirely. The top-k is ≤ k rows —
        // pull it to the driver once (KMeansLite-centroid pattern: tiny
        // model-sized result, one job, nothing left cached in the session)
        val rows = toks.toDF("tok")
          .join(broadcast(cands), Seq("tok"), "left_semi")
          .groupBy($"tok")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"tok".asc).limit(k)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        (u0, rows)
      } finally local.unpersist()

    // soundness gate: certify no non-candidate can reach (or tie into) the
    // top-k. u == 0 means every partition emitted its entire key set — the
    // candidate pass was lossless. Otherwise the k-th exact count must be
    // STRICTLY above u: a non-candidate with count == u could tie the k-th
    // and win the lexicographic tie-break, so >= is not certifiable.
    val certified = (u == 0L) ||
      (topRows.length == k && topRows.map(_._2).min > u)
    if (certified) topRows.toSeq.toDF("tok", "n")
    else
      // provably-exact fallback: full aggregation (the candidate pass failed
      // to certify — flat distribution or localM too small for this data)
      toks.toDF("tok").groupBy($"tok").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok".asc).limit(k)
  }
}
