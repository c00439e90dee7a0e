package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom membership primitives (Catalyst runtime-filter expressions exposed
  * as BloomFunctions + graft_bloom_agg/graft_might_contain): the soundness
  * property the q90 decontamination pattern rests on is NO FALSE NEGATIVES —
  * every member must probe true; false positives are allowed (the exact
  * confirm join removes them) and must stay near the sized rate.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  test("bloom membership has no false negatives and a sane false-positive rate") {
    val members = (1 to 1000).map(i => s"member_$i")
    val bloom = members.toDF("k")
      .agg(BloomFunctions.bloomAgg($"k", 1000L).as("bf")).first().getAs[Array[Byte]](0)
    val bf = lit(bloom)
    // every member probes true — the hard guarantee
    val missed = members.toDF("k")
      .filter(!BloomFunctions.mightContain(bf, $"k")).count()
    assert(missed === 0L, "bloom false negative — membership soundness broken")
    // non-members probe mostly false (default sizing ~3% fpp)
    val fp = (1 to 10000).map(i => s"other_$i").toDF("k")
      .filter(BloomFunctions.mightContain(bf, $"k")).count()
    assert(fp < 500L, s"false-positive rate ${fp / 100.0}% far above sized rate")
  }

  test("prefilter → exact confirm equals the plain exact semi-join (q90 pattern)") {
    val ref = (1 to 500).map(i => s"k${i * 3}").toDF("fp")
    val probe = (1 to 1500).map(i => s"k$i").toDF("fp")
    val bloom = ref.agg(BloomFunctions.bloomAgg($"fp", 500L).as("bf"))
      .first().getAs[Array[Byte]](0)
    val prefiltered = probe.filter(BloomFunctions.mightContain(lit(bloom), $"fp"))
      .join(ref, Seq("fp"), "left_semi")
    val exact = probe.join(ref, Seq("fp"), "left_semi")
    assert(prefiltered.collect().map(_.getString(0)).sorted.toSeq ===
      exact.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("graft_bloom_agg / graft_might_contain work on the SQL surface") {
    (1 to 100).map(i => s"v$i").toDF("k").createOrReplaceTempView("bloom_members")
    Seq("v1", "v50", "nope").toDF("k").createOrReplaceTempView("bloom_probes")
    val got = spark.sql(
      """SELECT k, graft_might_contain(
        |  (SELECT graft_bloom_agg(k, 100) FROM bloom_members), k) AS hit
        |FROM bloom_probes ORDER BY k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(got("v1") && got("v50"), "member probed false — false negative")
  }
}
