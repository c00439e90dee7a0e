package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-7 operator batch (q108–q111). The DuckDB
  * oracle is the value gate; these pin the properties the oracle can't see —
  * classifier sanity, quantization recall vs exact search, draw determinism
  * and monotonicity, batching invariants.
  */
class Round7OpsSpec extends SparkSpec {

  test("q108 NB classifier: predictions beat the prior baseline on its own training set") {
    import spark.implicits._
    val pred = CurationQueries.q108_nb_classifier(spark, sf)
    val truth = graft.Tables(spark, sf, "documents").select($"doc_id", $"lang")
    val joined = pred.join(truth, "doc_id").cache()
    val n = joined.count()
    val correct = joined.filter($"pred_lang" === $"lang").count()
    // majority-class baseline: predicting the most common lang for every doc
    val majority = truth.groupBy($"lang").count().agg(max($"count")).head.getLong(0)
    assert(correct > majority,
      s"train-set accuracy $correct/$n should beat the majority baseline $majority/$n")
    joined.unpersist()
    ()
  }

  test("q109 PQ: 3 contiguous ranks per query, refined distances non-negative and ordered") {
    import spark.implicits._
    val out = EmbeddingQueries.q109_pq_ann(spark, sf).cache()
    val perQuery = out.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), min($"rank").as("lo"), max($"rank").as("hi"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getAs[Long]("n") == 3 && r.getAs[Int]("lo") == 1 && r.getAs[Int]("hi") == 3)
    }
    // refined exact distances are non-negative and non-decreasing in rank
    val bad = out.withColumn("prev", lag($"dist", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id").orderBy($"rank")))
      .filter($"dist" < 0 || ($"prev".isNotNull && $"dist" < $"prev"))
    assert(bad.count() == 0)
    out.unpersist()
    ()
  }

  test("q109 PQ: ADC top-3 recalls a majority of the exact L2 top-3 (compression sanity)") {
    import spark.implicits._
    // PQ approximates SQUARED-L2 (the FAISS-default metric q109 encodes);
    // the exact reference must use the same metric, not the cosine the rest
    // of the ANN family ranks by — the fixtures' vectors are not unit-norm,
    // so the two rankings legitimately differ.
    val emb = graft.Tables(spark, sf, "embeddings")
    def d(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".cast("array<double>").as("qv"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
      .orderBy($"dist".asc, $"neighbor_id".asc)
    val exact = emb.select($"vec_id".as("neighbor_id"),
        $"embedding".cast("array<double>").as("nv"))
      .crossJoin(broadcast(q)).filter($"neighbor_id" =!= $"query_id")
      .select($"query_id", $"neighbor_id", d($"qv", $"nv").as("dist"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id")
    val approx = EmbeddingQueries.q109_pq_ann(spark, sf)
      .select($"query_id", $"neighbor_id")
    val hits = exact.join(approx, Seq("query_id", "neighbor_id")).count()
    val total = exact.count()
    // 4-byte codes vs 256-byte vectors: expect most exact neighbors to survive
    assert(hits * 2 >= total, s"PQ recall too low: $hits/$total")
  }

  test("q112 IVFADC: agrees with PQ-exhaustive on shared pairs; 2/3 recall vs exact-in-probed-cells") {
    import spark.implicits._
    def d(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    val ivfadc = EmbeddingQueries.q112_ivfadc(spark, sf).cache()
    // both end in the same exact-refine: any (query, neighbor) present in
    // both outputs must carry the identical refined distance
    val pq = EmbeddingQueries.q109_pq_ann(spark, sf)
      .select($"query_id", $"neighbor_id", $"dist".as("dist_pq"))
    val mismatch = ivfadc.join(pq, Seq("query_id", "neighbor_id"))
      .filter($"dist" =!= $"dist_pq")
    assert(mismatch.count() == 0)
    // structural exactness: at this fixture size the 2 probed cells hold
    // fewer candidates than the 16-shortlist, so IVFADC must EQUAL exact L2
    // search restricted to the probed cells (unrestricted recall is the
    // tunable-probe trade q74's audit measures, not a pass/fail property)
    val emb = graft.Tables(spark, sf, "embeddings")
    val cent = emb.select($"label",
        posexplode($"embedding".cast("array<double>")).as(Seq("pos", "x")))
      .groupBy($"label", $"pos").agg(avg($"x").as("m"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"m"))), e => e("m")).as("cv"))
    val q = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".cast("array<double>").as("qv"))
    val wP = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
      .orderBy(round($"pd", 9).asc, $"label".asc)
    val probe = q.crossJoin(broadcast(cent))
      .select($"query_id", $"qv", $"label", d($"qv", $"cv").as("pd"))
      .withColumn("rn", row_number().over(wP)).filter($"rn" <= 2)
      .select($"query_id", $"qv", $"label".as("probe_label"))
    val wE = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
      .orderBy(round($"edist", 9).asc, $"neighbor_id".asc)
    val restricted = emb.select($"vec_id".as("neighbor_id"), $"label",
        $"embedding".cast("array<double>").as("nv"))
      .join(broadcast(probe), $"label" === $"probe_label" && $"neighbor_id" =!= $"query_id")
      .select($"query_id", $"neighbor_id", d($"qv", $"nv").as("edist"))
      .withColumn("rank", row_number().over(wE)).filter($"rank" <= 3)
      .select($"query_id", $"neighbor_id")
    val got = ivfadc.select($"query_id", $"neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = restricted.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact equality would need an ADC-lossless shortlist; at this codebook
    // granularity (M=4, k=8) the ADC top-32 of ~100 in-cell candidates keeps
    // 12/15 of the restricted-exact top-3 (measured) — pin a 2/3 floor so a
    // codes/table regression (which collapses this to near-zero, as the
    // degenerate label-codebook draft did) still fails loudly
    val hits = (got intersect want).size
    assert(hits * 3 >= want.size * 2,
      s"IVFADC restricted recall too low: $hits/${want.size}; missing=${want -- got}")
    ivfadc.unpersist()
    ()
  }

  test("q110 mixture draw: deterministic, dominant source keeps everything, kept <= corpus") {
    import spark.implicits._
    val a = CorpusQueries.q110_mixture_sample(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val b = CorpusQueries.q110_mixture_sample(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(a.sameElements(b), "re-running the draw must yield the identical subsample")
    // the max-rate source has rate 1.0 and keeps every document
    val top = a.maxBy(_._2)
    assert(top._2 == 1.0)
    val srcCounts = graft.Tables(spark, sf, "documents")
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top._3 == srcCounts(top._1), "rate-1.0 source must keep all docs")
    // no source keeps more than it has
    a.foreach { case (src, _, kept, _) => assert(kept <= srcCounts(src)) }
  }

  test("q117's sentinel-replace merge semantics are the documented alternate-pair variant") {
    import spark.implicits._
    // the load-bearing assumption, pinned: replace() is non-overlapping
    // left-to-right, and because each match CONSUMES the shared trailing
    // sentinel, a run of repeated symbols merges ALTERNATE pairs — the token
    // after a merge is skipped (aaa -> [aa, a]; aaaa -> [aa, a, a], NOT
    // rescan-greedy's [aa, aa]). Both engines implement replace identically,
    // so the oracle gate holds universally; this spec exists so nobody
    // "fixes" the variant on one side only.
    val S = "\u0001"
    val out = Seq(s"${S}a${S}a${S}a${S}", s"${S}a${S}a${S}a${S}a${S}", s"${S}b${S}a${S}a${S}")
      .toDF("sym")
      .select(replace($"sym", lit(s"${S}a${S}a${S}"), lit(s"${S}aa${S}")).as("m"))
      .as[String].collect()
    assert(out(0) == s"${S}aa${S}a${S}")        // aaa  -> [aa, a]
    assert(out(1) == s"${S}aa${S}a${S}a${S}")   // aaaa -> [aa, a, a] (alternate-pair)
    assert(out(2) == s"${S}b${S}aa${S}")        // baa  -> [b, aa]
  }

  test("q119 encode: zero-shuffle pass, subword counts bounded by words and chars") {
    import spark.implicits._
    val out = CurationQueries.q119_bpe_encode(spark, sf)
    // the fit runs eagerly inside the call; the RETURNED encode pass must be
    // a pure narrow pipeline — merges ride along as literals, no Exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"encode should be a pure narrow pipeline:\n$plan")
    val toks = graft.functions.TextFunctions.tokens($"text")
    val chars = graft.Tables(spark, sf, "documents")
      .select($"doc_id", aggregate(transform(toks, w => length(w).cast("long")),
        lit(0L), (a, b) => a + b).as("tok_chars"))
    val j = out.join(chars, "doc_id").cache()
    // every word is >=1 subword; no word splits below 1 char per subword
    assert(j.filter($"n_subwords" < $"n_words" || $"n_subwords" > $"tok_chars")
      .count() == 0)
    // the trained merges actually fire: corpus-wide, encoding is strictly
    // coarser than character-level
    val agg0 = j.agg(sum($"n_subwords"), sum($"tok_chars")).head
    assert(agg0.getLong(0) < agg0.getLong(1))
    j.unpersist()
    ()
  }

  test("q120 DSIR: selection strongly enriches the target slice, deterministically") {
    import spark.implicits._
    val sel = CurationQueries.q120_dsir_select(spark, sf).cache()
    val k = sel.count()
    val truth = graft.Tables(spark, sf, "documents").select($"doc_id", $"lang")
    val enSel = sel.join(truth, "doc_id").filter($"lang" === "en").count()
    val enAll = truth.filter($"lang" === "en").count()
    val all = truth.count()
    // the importance weights must concentrate target-language docs well above
    // the corpus base rate (~44% en at this fixture): require a 2/3 majority
    assert(enSel * 3 >= k * 2,
      s"target enrichment too weak: $enSel/$k selected en vs base $enAll/$all")
    // re-running the whole fit+score must reproduce the identical ranking
    val again = CurationQueries.q120_dsir_select(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val first = sel.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(first == again)
    sel.unpersist()
    ()
  }

  test("q121 PMI: support floor holds, ranking sorted, scores recompute from raw counts") {
    import spark.implicits._
    val out = TextQueries.q121_pmi_collocations(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("cab") >= 5L))
    val pmis = out.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (x, y) => x >= y })
    // independent recomputation of the top pair's score from first principles
    val ws = graft.Tables(spark, sf, "documents")
      .select(graft.functions.TextFunctions.tokens($"text").as("ws"))
      .filter(size($"ws") > 0).cache()
    val top = out.head
    val (a, b) = (top.getAs[String]("a"), top.getAs[String]("b"))
    val n1 = ws.agg(sum(size($"ws"))).head.getLong(0).toDouble
    val nb = ws.agg(sum(greatest(size($"ws") - 1, lit(0)))).head.getLong(0).toDouble
    val ca = ws.select(explode($"ws").as("t")).filter($"t" === a).count().toDouble
    val cb = ws.select(explode($"ws").as("t")).filter($"t" === b).count().toDouble
    val cab = top.getAs[Long]("cab").toDouble
    val want = math.log((cab / nb) / ((ca / n1) * (cb / n1)))
    assert(math.abs(top.getAs[Double]("pmi") - want) < 1e-5,
      s"pmi mismatch for ($a,$b): got ${top.getAs[Double]("pmi")} want $want")
    ws.unpersist()
    ()
  }

  test("q122 Zipf: every source covered, slopes non-positive, top source recomputes") {
    import spark.implicits._
    val out = CorpusQueries.q122_zipf_slope(spark, sf).collect()
    val nSources = graft.Tables(spark, sf, "documents")
      .select($"source").distinct().count()
    assert(out.length == nSources)
    // frequency is non-increasing in rank by construction, so the fitted
    // slope can never be positive
    assert(out.forall(_.getAs[Double]("zipf_slope") <= 0.0))
    // recompute one source's slope from an independent token count
    val src0 = out.minBy(_.getAs[String]("source"))
    val ranks = graft.Tables(spark, sf, "documents")
      .filter($"source" === src0.getAs[String]("source"))
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"tok").count()
      .collect().map(r => r.getLong(1))
      .sortBy(-_).take(200)
    val xy = ranks.zipWithIndex.map { case (c, i) =>
      (BigDecimal(math.log(i + 1.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.log(c.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxx, sxy) = (xy.map(p => p._1 * p._1).sum, xy.map(p => p._1 * p._2).sum)
    val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(src0.getAs[Double]("zipf_slope") - want) < 1e-5,
      s"slope mismatch: got ${src0.getAs[Double]("zipf_slope")} want $want")
  }

  test("q123 RRF: 5x5 output, scores in range, fused score recomputes from component ranks") {
    import spark.implicits._
    val out = EmbeddingQueries.q123_hybrid_rrf(spark, sf).cache()
    assert(out.count() == 25)
    assert(out.groupBy($"query_id").count().filter($"count" =!= 5).count() == 0)
    // RRF of <=2 lists with rank >= 1 and K=60: score in (0, 2/61]
    assert(out.filter($"rrf" <= 0.0 || $"rrf" > 2.0 / 61 + 1e-9).count() == 0)
    // recompute the fused score of every output row from the two component
    // rankings, built independently here
    val emb = graft.Tables(spark, sf, "embeddings")
    val dense = graft.functions.SimilarityFunctions
      .bruteForceTopK(emb, emb.filter($"vec_id" < 5), "vec_id", "embedding", 20)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank")).toMap
    val toks = graft.Tables(spark, sf, "documents")
      .select($"doc_id", explode(array_distinct(
        graft.functions.TextFunctions.tokens($"text"))).as("tok"))
    val lex = toks.join(broadcast(
        toks.filter($"doc_id" < 5).select($"doc_id".as("query_id"), $"tok")), "tok")
      .filter($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id").agg(count(lit(1)).as("ov"))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"ov".desc, $"doc_id".asc)))
      .filter($"r" <= 20)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Int]("r")).toMap
    out.collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))
      val want = lex.get(key).map(x => 1.0 / (x + 60)).getOrElse(0.0) +
        dense.get(key).map(x => 1.0 / (x + 60)).getOrElse(0.0)
      assert(want > 0.0, s"fused doc $key in neither component list")
      assert(math.abs(r.getAs[Double]("rrf") - want) < 1e-5)
    }
    out.unpersist()
    ()
  }

  test("q124 coverage curve: monotone in vocab size, bounded by total, saturates at full vocab") {
    import spark.implicits._
    val out = CurationQueries.q124_vocab_coverage(spark, sf)
      .orderBy($"vocab_size").collect()
    assert(out.length == 3)
    val cov = out.map(r => (r.getAs[Long]("vocab_size"), r.getAs[Long]("covered_tokens"),
      r.getAs[Long]("total_tokens")))
    assert(cov.forall { case (_, c, t) => c >= 0 && c <= t })
    assert(cov.map(_._2).zip(cov.map(_._2).tail).forall { case (a, b) => a <= b })
    // once k >= |vocab|, coverage is exactly total
    val vocabSize = graft.Tables(spark, sf, "documents")
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("t"))
      .distinct().count()
    cov.filter(_._1 >= vocabSize).foreach { case (_, c, t) => assert(c == t) }
  }

  test("q125 split: exact integer proportions per source, conservation, determinism") {
    import spark.implicits._
    val out = CorpusQueries.q125_split_manifest(spark, sf).cache()
    val bySrc = out.collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap)
    val srcN = graft.Tables(spark, sf, "documents")
      .groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (src, m) =>
      val n = srcN(src)
      assert(m.getOrElse("test", 0L) == n / 10, s"$src test")
      assert(m.getOrElse("val", 0L) == 2 * n / 10 - n / 10, s"$src val")
      assert(m.values.sum == n, s"$src conservation")
    }
    // leak counts are symmetric facts about fingerprints: re-running must agree
    val again = CorpusQueries.q125_split_manifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val first = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(first == again)
    out.unpersist()
    ()
  }

  test("q126 curriculum: unique steps, difficulty monotone per source, sources interleave") {
    import spark.implicits._
    val out = CurationQueries.q126_curriculum(spark, sf).collect()
    val total = graft.Tables(spark, sf, "documents").count()
    assert(out.length == total)
    val steps = out.map(_.getAs[Long]("step"))
    assert(steps.distinct.length == steps.length, "steps must be unique")
    // per source: n_tokens non-decreasing as step grows
    out.groupBy(_.getAs[String]("source")).values.foreach { rows =>
      val ordered = rows.sortBy(_.getAs[Long]("step")).map(_.getAs[Long]("n_tokens"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a <= b })
    }
    // interleaving: among the first S steps taken in order, every source
    // appears exactly once (equal-sized fixture sources => exact round-robin)
    val s = out.map(_.getAs[String]("source")).distinct.length
    val firstCycle = out.sortBy(_.getAs[Long]("step")).take(s).map(_.getAs[String]("source"))
    assert(firstCycle.distinct.length == s, s"first cycle not a permutation: ${firstCycle.toSeq}")
  }

  test("q127 funnel: stages monotone non-increasing; stage-2 recomputes via exists") {
    import spark.implicits._
    val out = EventQueries.q127_funnel(spark, sf).orderBy($"stage").collect()
    val users = out.map(_.getAs[Long]("users"))
    assert(users.length == 3 && users(0) >= users(1) && users(1) >= users(2))
    assert(users(0) > users(1), "window must discriminate on this fixture")
    // independent stage-2 recomputation: users with a click in
    // (first_view, first_view + 24h]
    val ev = graft.Tables(spark, sf, "events")
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("tv"))
    val want = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"tv" && $"ts" <= $"tv" + expr("INTERVAL 24 HOURS"))
      .select($"user_id").distinct().count()
    assert(users(1) == want)
  }

  test("q128 CCNet buckets: tertile sizes, conservation, ordered score ranges per lang") {
    import spark.implicits._
    val out = CorpusQueries.q128_ccnet_buckets(spark, sf).collect()
    val langN = graft.Tables(spark, sf, "documents")
      .filter(size(graft.functions.TextFunctions.tokens($"text")) > 0)
      .groupBy($"lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val m = rows.map(r => r.getAs[String]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("min_lp"), r.getAs[Double]("max_lp")))).toMap
      val n = langN(lang)
      assert(m("head")._1 == n / 3, s"$lang head size")
      assert(m("middle")._1 == 2 * n / 3 - n / 3, s"$lang middle size")
      assert(rows.map(_.getAs[Long]("n_docs")).sum == n, s"$lang conservation")
      // head holds the highest scores, tail the lowest; ranges stack
      assert(m("head")._2 >= m("middle")._3 - 1e-9, s"$lang head/middle overlap")
      assert(m("middle")._2 >= m("tail")._3 - 1e-9, s"$lang middle/tail overlap")
    }
  }

  test("q129 bitext margin: pairs are cross-lingual, margins sorted, top margin beats 1") {
    import spark.implicits._
    val out = EmbeddingQueries.q129_bitext_margin(spark, sf).collect()
    assert(out.length == 10)
    val margins = out.map(_.getAs[Double]("margin"))
    assert(margins.zip(margins.tail).forall { case (a, b) => a >= b })
    // margin > 1 means the pair's cosine exceeds its neighborhood average —
    // the selection criterion the method exists for; the top pair must clear it
    assert(margins.head > 1.0)
    // every mined pair joins an en query to a non-en candidate
    val langs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      assert(langs(r.getAs[Long]("qid")) == "en")
      assert(langs(r.getAs[Long]("cid")) != "en")
    }
  }

  test("q130 PageRank: ranks positive and sorted, every ranked doc sits in the dup graph") {
    import spark.implicits._
    val got = TextQueries.q130_dedup_pagerank(spark, sf).collect()
    assert(got.length == 10)
    val pr = got.map(_.getAs[Double]("pagerank"))
    assert(pr.forall(_ > 0.0))
    assert(pr.zip(pr.tail).forall { case (a, b) => a >= b })
    // cross-check membership + degree against the same candidate-pair builder
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"source", graft.functions.TextFunctions.tokenSet($"text").as("toks"))
    val pairs = graft.functions.DedupFunctions
      .candidatePairs(docs, "doc_id", "toks", hashes = 12, bands = 2,
        minJaccard = 0.9, scopeCols = Seq("source"))
      .select($"id_a", $"id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val degrees = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    got.foreach { r =>
      val (id, d) = (r.getAs[Long]("doc_id"), r.getAs[Long]("degree"))
      assert(degrees.getOrElse(id, 0L) == d, s"degree mismatch for $id")
    }
    // the most central doc should not be a leaf of its cluster
    assert(got.head.getAs[Long]("degree") >= 2)
  }

  test("q131 skew audit: conservation, skew >= 1, heaviest key verified for one column") {
    import spark.implicits._
    val out = TpchQueries.q131_skew_audit(spark, sf).collect()
      .map(r => r.getAs[String]("key_col") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("max_key_rows"), r.getAs[Double]("skew_factor")))).toMap
    assert(out.keySet == Set("l_orderkey", "l_partkey", "l_suppkey"))
    val li = graft.Tables(spark, sf, "lineitem")
    val n = li.count()
    out.values.foreach { case (rows, keys, mx, skew) =>
      assert(rows == n)
      assert(mx >= (rows + keys - 1) / keys, "max below ceiling of the mean")
      assert(skew >= 1.0 - 1e-9)
    }
    val heaviest = li.groupBy($"l_suppkey").count()
      .agg(max($"count")).head.getLong(0)
    assert(out("l_suppkey")._3 == heaviest)
  }

  test("q134 LSH recall audit: counts consistent, no false survivors, recall near theory") {
    val r = TextQueries.q134_lsh_recall_audit(spark, sf).head()
    val (nTrue, nDet, nHit, recall) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nTrue > 0, "fixture must contain true near-dup pairs for the audit to mean anything")
    assert(nHit <= nDet && nHit <= nTrue)
    // candidates that survive the exact-Jaccard verify are true pairs
    // (modulo 32-bit hash collisions, absent at this vocabulary)
    assert(nHit == nDet, s"false survivors: detected=$nDet hit=$nHit")
    // banding theory at s=0.9, 2 bands x 6 rows: p = 1-(1-0.9^6)^2 ~ 0.78;
    // pin a 0.5 floor so a banding regression (wrong band count, broken
    // signature) fails loudly without chasing the exact fixture value
    assert(recall >= 0.5 && recall <= 1.0, s"recall $recall out of band")
  }

  test("q135 assembly funnel: stage counts monotone, budget respected, filter verified") {
    import spark.implicits._
    val out = CorpusQueries.q135_assembly_funnel(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (f, d, sel, tok) = (r.getAs[Long]("n_after_filter"),
        r.getAs[Long]("n_after_dedup"), r.getAs[Long]("n_selected"),
        r.getAs[Long]("tokens_selected"))
      assert(f >= d && d >= sel, s"funnel must narrow: $f >= $d >= $sel")
      assert(tok <= 600L, s"budget breached: $tok")
    }
    // stage-1 count for one source recomputed from the raw table
    val src = out.head.getAs[String]("source")
    val want = graft.Tables(spark, sf, "documents").filter($"source" === src)
      .select(size(graft.functions.TextFunctions.tokens($"text")).cast("long").as("nt"),
        size(graft.functions.TextFunctions.tokenSet($"text")).cast("long").as("nd"))
      .filter($"nt" >= 20 && $"nd" * 10 >= $"nt" * 3).count()
    assert(out.head.getAs[Long]("n_after_filter") == want)
  }

  test("q136 Q18: every reported order clears the quantity threshold (recount)") {
    import spark.implicits._
    val out = TpchQueries.q136_tpch_q18(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getAs[Double]("sum_qty") > 330.0))
    val li = graft.Tables(spark, sf, "lineitem")
    val want = li.filter($"l_orderkey" === out.head.getAs[Long]("o_orderkey"))
      .agg(sum($"l_quantity")).head.getDouble(0)
    assert(out.head.getAs[Double]("sum_qty") == want)
  }

  test("q137 pivot: one row per event type, cells sum to the table count") {
    import spark.implicits._
    val out = TpchQueries.q137_event_pivot(spark, sf).collect()
    val ev = graft.Tables(spark, sf, "events")
    assert(out.length == ev.select($"event_type").distinct().count())
    val total = out.map(r => (1 to 7).map(d => r.getAs[Long](s"dow_$d")).sum).sum
    assert(total == ev.count())
  }

  test("q138 as-of snapshot: one row per active key, latest event verified for one user") {
    import spark.implicits._
    val got = EventQueries.q138_asof_snapshot(spark, sf).collect()
    val ev = graft.Tables(spark, sf, "events")
      .filter($"ts" <= lit("2024-01-15").cast("timestamp"))
    assert(got.length == ev.select($"user_id").distinct().count())
    assert(got.map(_.getAs[Long]("n_changes")).sum == ev.count())
    val u = got.head.getAs[Long]("user_id")
    val latest = ev.filter($"user_id" === u)
      .orderBy($"ts".desc, $"event_id".desc).limit(1).head()
    assert(got.head.getAs[Long]("last_event_id") == latest.getAs[Long]("event_id"))
  }

  test("q139 cohorts: week-0 full retention, actives bounded, cohort sizes conserve") {
    import spark.implicits._
    val out = EventQueries.q139_cohort_retention(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_active") <= r.getAs[Long]("n_cohort")))
    // week 0 contains the cohort-defining purchase, so retention is 1 by construction
    out.filter(_.getAs[Long]("wk") == 0L)
      .foreach(r => assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_cohort")))
    val cohortTotal = out.filter(_.getAs[Long]("wk") == 0L)
      .map(_.getAs[Long]("n_cohort")).sum
    val purchasers = graft.Tables(spark, sf, "events")
      .filter($"event_type" === "purchase").select($"user_id").distinct().count()
    assert(cohortTotal == purchasers)
  }

  test("q141 graph census: transitivity in range and high, edges cross-checked") {
    import spark.implicits._
    val r = TextQueries.q141_dedup_graph_stats(spark, sf).head()
    val (nodes, edges, tris, trans) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nodes > 0 && edges > 0)
    assert(trans >= 0.0 && trans <= 1.0)
    // near-dup relations are approximately transitive: a dup graph whose
    // transitivity collapses means the threshold admits accidental bridges
    assert(trans >= 0.2, s"dedup graph unexpectedly un-clustered: $trans")
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"source", graft.functions.TextFunctions.tokenSet($"text").as("toks"))
    val wantEdges = graft.functions.DedupFunctions
      .candidatePairs(docs, "doc_id", "toks", hashes = 12, bands = 2,
        minJaccard = 0.9, scopeCols = Seq("source")).count()
    assert(edges == wantEdges)
    assert(tris >= 0L)
  }

  test("q118 decodeAudio parses real WAV frames and skips junk payloads") {
    import spark.implicits._
    val wav = graft.functions.Multimodal.syntheticWav(250, 8000, seed = 9L)
    // the hand-rolled RIFF bytes are a GENUINE WAV: the JDK's own stack
    // parses them to the same frames/rate — the fast-path parse is a
    // performance route (AudioSystem's global lock convoys under 32 tasks),
    // not a private format
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFrameLength == 250 && ais.getFormat.getSampleRate == 8000f)
    ais.close()
    val rows = Seq(
      (1L, wav),
      (2L, "not audio".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "payload")
    val out = graft.functions.Multimodal.decodeAudio(rows, "id", "payload")
      .collect().map(a => a.media_id ->
        ((a.n_frames, a.sample_rate, a.channels, a.duration_us))).toMap
    assert(out === Map(1L -> ((250L, 8000, 1, 31250L))))
  }

  test("q111 batching: batch size <= 8, padding waste >= 0, every doc batched once") {
    import spark.implicits._
    val out = CurationQueries.q111_length_batches(spark, sf).cache()
    assert(out.filter($"n_docs" > 8 || $"n_docs" < 1).count() == 0)
    assert(out.filter($"padding_waste" < 0).count() == 0)
    // per bucket: only the LAST batch may be partial (deterministic chunking)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"bucket")
    val partialNonLast = out
      .withColumn("maxb", max($"batch_id").over(w))
      .filter($"n_docs" < 8 && $"batch_id" < $"maxb")
    assert(partialNonLast.count() == 0)
    // doc conservation: batched docs == docs with >0 tokens
    val batched = out.agg(sum($"n_docs")).head.getLong(0)
    val docs = graft.Tables(spark, sf, "documents")
      .filter(size(graft.functions.TextFunctions.tokens($"text")) > 0).count()
    assert(batched == docs)
    out.unpersist()
    ()
  }
}
