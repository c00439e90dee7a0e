package graft.operators

import graft.SparkSpec
import graft.functions.{DedupFunctions => D, TextFunctions => T}
import org.apache.spark.sql.functions._

/** Round-4 corpus-hygiene operators: sentence segmentation, exact heavy
  * hitters (candidate pass + soundness certification), Unicode NFC
  * normalization (native expression, both execution paths), and cross-corpus
  * near-dup.
  */
class CorpusOpsSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------- sentences
  test("sentences splits on terminator+whitespace, trims, drops empties") {
    val rows = Seq(
      "Hello there. Big world! Ok? Yes end",
      "No terminal punctuation at all",
      "Trailing dot.",
      "  ",
      "Double.  Space.   After!").toDF("text")
      .select(T.sentences($"text").as("s")).as[Seq[String]].collect()
    assert(rows(0) === Seq("Hello there.", "Big world!", "Ok?", "Yes end"))
    assert(rows(1) === Seq("No terminal punctuation at all"))
    // no whitespace after the final dot — single sentence, kept whole
    assert(rows(2) === Seq("Trailing dot."))
    assert(rows(3) === Seq.empty)
    assert(rows(4) === Seq("Double.", "Space.", "After!"))
  }

  test("sentences: mid-token dots (3.14, e.g) do not split without whitespace") {
    val out = Seq("Pi is 3.14 here. And e.g.x stays").toDF("text")
      .select(T.sentences($"text").as("s")).as[Seq[String]].collect().head
    assert(out === Seq("Pi is 3.14 here.", "And e.g.x stays"))
  }

  // ---------------------------------------------------------- heavy hitters
  test("HeavyHitters.topK is exact on a Zipf-ish distribution (certified path)") {
    val toks = (Seq.fill(100)("the") ++ Seq.fill(50)("of") ++ Seq.fill(25)("and") ++
      (1 to 200).map(i => s"rare$i")).toDS()
    val got = HeavyHitters.topK(toks.repartition(4), k = 3, localM = 8)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("the", 100L), ("of", 50L), ("and", 25L)))
  }

  test("HeavyHitters.topK stays exact when certification fails (flat distribution)") {
    // every token appears exactly twice across different partitions: local
    // bounds are non-zero and the k-th count can't clear them, so the
    // operator must fall back to the full exact aggregation — and the
    // result must STILL be the exact top-k with lexicographic tie-break
    val toks = ((1 to 50) ++ (1 to 50)).map(i => f"t$i%02d").toDS()
    val got = HeavyHitters.topK(toks.repartition(8), k = 5, localM = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("t01", 2L), ("t02", 2L), ("t03", 2L), ("t04", 2L), ("t05", 2L)))
  }

  test("HeavyHitters.topK ties at the boundary break lexicographically") {
    val toks = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(5)("c") ++
      Seq.fill(9)("z")).toDS()
    val got = HeavyHitters.topK(toks, k = 2, localM = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("z", 9L), ("a", 5L)))
  }

  test("HeavyHitters.topK equals the exact top-k for random inputs (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small vocab + skew mix so runs hit BOTH the certified path and the
    // uncertifiable fallback; partition count varies the miss bounds
    val gen = for {
      xs <- Gen.listOfN(120,
        Gen.frequency(5 -> Gen.const("hot"), 3 -> Gen.const("warm"),
          2 -> Gen.oneOf((1 to 30).map(i => s"t$i"))))
      parts <- Gen.chooseNum(1, 6)
      k <- Gen.chooseNum(1, 5)
      m <- Gen.chooseNum(5, 12)
    } yield (xs, parts, k, m)
    val prop = Prop.forAll(gen) { case (xs, parts, k, m) =>
      val expected = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(k)
      val got = HeavyHitters.topK(xs.toDS().repartition(parts), k, localM = math.max(k, m))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      got == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, s"topK property: $res")
  }

  test("HeavyHitters.topK ignores null tokens (COUNT(col) semantics)") {
    val toks = Seq("a", "a", null, null, null, "b").toDS()
    val got = HeavyHitters.topK(toks.repartition(2), k = 2, localM = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 2L), ("b", 1L)))
  }

  // ------------------------------------------------------------------- NFC
  test("graft_nfc composes decomposed characters (interpreted + codegen agree)") {
    val decomposed = "e\u0301cole" // e + combining acute (U+0301)
    val composed = "\u00e9cole"    // precomposed \u00e9
    val df = Seq((decomposed, composed)).toDF("d", "c")
    def nfc(col: org.apache.spark.sql.Column) = T.nfcNormalize(col)
    val row = df.select(nfc($"d").as("nd"), nfc($"c").as("nc")).collect().head
    assert(row.getString(0) === composed)
    assert(row.getString(1) === composed)
    // fingerprints now agree — the reason the clean pass runs before dedup
    val fps = df.select(md5(nfc($"d")).as("a"), md5(nfc($"c")).as("b")).collect().head
    assert(fps.getString(0) === fps.getString(1))
  }

  test("graft_nfc is registered on the SQL surface and handles NULL") {
    val got = spark.sql("SELECT graft_nfc('e\u0301cole') AS n, graft_nfc(NULL) AS z")
      .collect().head
    assert(got.getString(0) === "\u00e9cole")
    assert(got.isNullAt(1))
  }

  // --------------------------------------------------------- quantiles
  test("approx_percentile (scale path) tracks exact percentile on doc lengths") {
    val docs = graft.Tables(spark, sf, "documents")
    val row = docs.agg(
      percentile($"n_chars", lit(0.5)).as("exact"),
      approx_percentile($"n_chars", lit(0.5), lit(1000)).as("approx")).collect().head
    val exact = row.getDouble(0)
    val approx = row.getAs[Number](1).doubleValue()
    // t-digest at accuracy 1000 on a few hundred values is near-exact; the
    // assertion bounds relative error so the documented q88 scale path is
    // backed by a measurement, not a claim
    assert(math.abs(approx - exact) / math.max(1.0, exact) < 0.05,
      s"approx=$approx exact=$exact")
  }

  // ---------------------------------------------------- cross-corpus dedup
  test("crossCorpusPairs bucket cap bounds degenerate-bucket fan-out, keeps decisions") {
    // 40 new + 40 ref docs with IDENTICAL token sets: one mega-bucket per
    // band. Uncapped: 40×40 = 1600 pairs; capped at 3 refs/bucket: ≤ 120 —
    // and every new doc still gets matched (the dedup decision survives)
    val toks = Seq("the", "same", "boilerplate", "tokens")
    val newDocs = (1 to 40).map(i => (i.toLong, toks)).toDF("doc_id", "toks")
    val refDocs = (101 to 140).map(i => (i.toLong, toks)).toDF("doc_id", "toks")
    val capped = D.crossCorpusPairs(newDocs, refDocs, "doc_id", "toks",
      hashes = 12, bands = 2, minJaccard = 0.9, maxRefPerBucket = 3)
    val pairs = capped.collect()
    assert(pairs.length <= 40 * 3, s"cap did not bound fan-out: ${pairs.length} pairs")
    assert(pairs.map(_.getLong(0)).distinct.length === 40,
      "a new doc lost its dedup decision under the cap")
  }

  test("crossCorpusPairs finds planted near-dups across the corpus split") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"source", T.tokenSet($"text").as("toks"))
    val half = substring($"source", 4, 10).cast("int")
    val pairs = D.crossCorpusPairs(
      docs.filter(half >= 10), docs.filter(half < 10),
      "doc_id", "toks", hashes = 12, bands = 2, minJaccard = 0.9).cache()
    val n = pairs.count()
    assert(n > 0, "fixture plants cross-source duplicates; none found")
    // direction: id_new only from the new half, id_ref only from the ref half
    val ids = docs.select($"doc_id", half.as("h")).cache()
    val wrongNew = pairs.join(ids, pairs("id_new") === ids("doc_id"))
      .filter($"h" < 10).count()
    val wrongRef = pairs.join(ids, pairs("id_ref") === ids("doc_id"))
      .filter($"h" >= 10).count()
    assert(wrongNew === 0 && wrongRef === 0)
    // verified: every reported pair really has Jaccard >= 0.9
    assert(pairs.filter($"jaccard" < 0.9).count() === 0)
    ids.unpersist(); pairs.unpersist()
  }

  test("empty token sets never pair (oracle parity: their DuckDB band is NULL)") {
    import org.apache.spark.sql.functions.lit
    // three empty docs + two identical non-empty docs in one scope: without
    // the size(hs)>0 guard every empty doc lands in ONE shared band bucket
    // (concat_ws skips the null signature parts) and 0/0 containments are
    // NaN, which PASSES thresholds under Spark's NaN-sorts-high
    val docs = Seq(
      (1L, Seq.empty[String]), (2L, Seq.empty[String]), (3L, Seq.empty[String]),
      (4L, Seq("alpha", "beta", "gamma")), (5L, Seq("alpha", "beta", "gamma"))
    ).toDF("doc_id", "toks").withColumn("source", lit("s"))
    val jp = D.candidatePairs(docs, "doc_id", "toks",
      hashes = 12, bands = 2, minJaccard = 0.5, scopeCols = Seq("source"))
    assert(jp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
    val cp = D.containmentPairs(docs, "doc_id", "toks",
      hashes = 12, bands = 2, minContainment = 0.5, scopeCols = Seq("source"))
    assert(cp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((4L, 5L)))
    jp.unpersist(); cp.unpersist()
  }

  test("crossCorpusPairsFromSignatures equals the two-DataFrame form (persisted ref side)") {
    val docs = graft.Tables(spark, sf, "documents").limit(120)
      .select($"doc_id", T.tokenSet($"text").as("toks"))
    val newBatch = docs.filter($"doc_id" % 3 === 0)
    val ref = docs.filter($"doc_id" % 3 =!= 0)
    val direct = D.crossCorpusPairs(newBatch, ref, "doc_id", "toks",
      hashes = 12, bands = 2, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sigDir = java.nio.file.Files.createTempDirectory("graft_sigs_").toString + "/ref"
    D.writeBandedSignatures(ref, "doc_id", "toks", hashes = 12, bands = 2, sigDir)
    val fromDisk = D.crossCorpusPairsFromSignatures(newBatch, sigDir, "doc_id", "toks",
      hashes = 12, bands = 2, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromDisk === direct, "persisted-signature path diverged from direct path")
    graft.pipeline.TempFiles.deleteTree(new java.io.File(sigDir).getParent)
  }
}
