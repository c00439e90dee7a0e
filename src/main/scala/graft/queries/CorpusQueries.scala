package graft.queries

import graft.Tables
import graft.functions.{DedupFunctions => D, TextFunctions => T}
import graft.operators.HeavyHitters
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators over the `documents` fixture, round-4 extension
  * batch: sentence-level dedup (the C4 recipe), exact heavy hitters with a
  * sketch-class candidate pass, unigram-LM quality scoring (perplexity proxy),
  * Unicode NFC text cleaning (native codegen expression), and cross-corpus
  * near-dup (dedup a new batch against an existing corpus). Every entry is
  * DuckDB-oracle-checked and exact.
  */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)
  private def tokSql = TextQueries.tokSql

  /** Mirror of TextFunctions.sentences for the oracles: replace each
    * sentence-boundary (terminator + whitespace) with an unused control char,
    * split on it, trim, drop empties — RE2-safe (no lookbehind).
    */
  private val sentSql =
    """list_filter(list_transform(
      |  string_split(regexp_replace(text, '([.!?])[ \t\n\f\r]+', '\1' || chr(1), 'g'), chr(1)),
      |  s -> trim(s)), s -> s <> '')""".stripMargin

  // ---------------------------------------------------- q82 sentence dedup
  /** C4-style sentence-level dedup: segment every document, keep only the
    * FIRST occurrence (by doc_id, then position) of each distinct sentence
    * corpus-wide, and report per-document retained/removed counts.
    *
    * Scale shape: the shuffle key is md5(sentence) — 32 bytes regardless of
    * sentence length — and the per-key work is a row_number over the copies of
    * ONE sentence. A pathological boilerplate sentence concentrates its copies
    * on one key; AQE skew-split handles the sort, and the downstream agg is
    * map-side partial either way. (The min-struct + join-back alternative
    * trades one more shuffle for no per-key sort; at the gate scale the window
    * plan is strictly better.)
    */
  val q82_sentence_dedup: Q = (s, dir) => {
    import s.implicits._
    val sents = t(s, dir, "documents")
      .select($"doc_id", posexplode_outer(T.sentences($"text")).as(Seq("pos", "sent")))
      .filter($"sent".isNotNull)
      .select($"doc_id", $"pos", md5($"sent").as("sk"))
    val w = Window.partitionBy($"sk").orderBy($"doc_id", $"pos")
    sents.withColumn("rn", row_number().over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_sents"),
        sum(when($"rn" === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when($"rn" =!= 1, 1L).otherwise(0L)).as("n_removed"))
  }

  val q82_oracle: String =
    s"""WITH sents AS (SELECT doc_id, $sentSql AS ss FROM documents),
       |s AS (SELECT doc_id, ss[i] AS sent, i AS pos
       |      FROM sents, unnest(generate_series(1, len(ss))) u(i)),
       |r AS (SELECT doc_id,
       |        row_number() OVER (PARTITION BY md5(sent) ORDER BY doc_id, pos) AS rn
       |      FROM s)
       |SELECT doc_id, count(*) AS n_sents,
       |  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  sum(CASE WHEN rn <> 1 THEN 1 ELSE 0 END)::BIGINT AS n_removed
       |FROM r GROUP BY doc_id""".stripMargin

  // ----------------------------------------------------- q83 heavy hitters
  /** Exact top-20 corpus tokens via the HeavyHitters candidate pass (local
    * top-m + miss bound, exact-count candidates only, certified against the
    * bound) — sketch-class shuffle volume, provably exact output.
    */
  val q83_heavy_hitters: Q = (s, dir) => {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode_outer(T.tokens($"text")).as("tok"))
      .filter($"tok".isNotNull)
      .as[String]
    HeavyHitters.topK(toks, k = 20, localM = 512)
      .withColumnRenamed("tok", "token")
  }

  val q83_oracle: String =
    s"""WITH tok AS (SELECT unnest($tokSql) AS token FROM documents),
       |c AS (SELECT token, count(*) AS n FROM tok GROUP BY token)
       |SELECT token, n FROM c ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ------------------------------------------------ q84 unigram log-prob
  /** Perplexity-proxy quality scoring: train a unigram LM on the corpus itself
    * (token counts / total), score each document by its mean token
    * log-probability. The standard cheap "is this text language-like" filter
    * (a document of rare/garbage tokens scores far below prose).
    *
    * Determinism contract with the oracle: per-token log-probs are rounded to
    * 6 dp, then summed by an ORDERED left fold over the document's token
    * positions on BOTH engines — float addition is order-sensitive, so the
    * fold order is pinned rather than left to aggregation order.
    *
    * Scale shape: vocab = one map-side-partial agg; total derives from vocab
    * (no extra corpus scan); the token→vocab join shuffles by token (or
    * broadcasts when the vocab fits); the per-doc fold is one agg on doc_id.
    */
  val q84_unigram_logprob: Q = (s, dir) => {
    import s.implicits._
    // NO fanOutScan here (measured r20): like q103, q84's token pass feeds
    // an agg AND a join from one subtree — fanned, q84's 1× read 0.88→1.11 s
    // and the composing q128 regressed 31% at the 10× rung (isolated A/B
    // 1.87 → 2.45 s); the serial scan is the faster shape for this class.
    val tok = t(s, dir, "documents")
      .select($"doc_id", posexplode_outer(T.tokens($"text")).as(Seq("pos", "tok")))
      .filter($"tok".isNotNull)
    val vocab = tok.groupBy($"tok").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum($"cnt").cast("double").as("total"))
    tok.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("lp", round(log($"cnt" / $"total"), 6))
      .groupBy($"doc_id")
      .agg(sort_array(collect_list(struct($"pos", $"lp"))).as("lps"))
      .select($"doc_id", size($"lps").as("n_tokens"),
        round(
          aggregate(transform($"lps", x => x.getField("lp")), lit(0.0), (a, b) => a + b)
            / size($"lps"), 6).as("logprob"))
  }

  val q84_oracle: String =
    s"""WITH tokl AS (SELECT doc_id, $tokSql AS ts FROM documents),
       |tok AS (SELECT doc_id, ts[i] AS tok, i AS pos
       |        FROM tokl, unnest(generate_series(1, len(ts))) u(i)),
       |vocab AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
       |tot AS (SELECT sum(cnt)::DOUBLE AS total FROM vocab),
       |lp AS (SELECT t.doc_id, t.pos, round(ln(v.cnt / tot.total), 6) AS lp
       |       FROM tok t JOIN vocab v ON t.tok = v.tok CROSS JOIN tot),
       |agg AS (SELECT doc_id, list(lp ORDER BY pos) AS lps FROM lp GROUP BY doc_id)
       |SELECT doc_id, len(lps) AS n_tokens,
       |  round(list_reduce(list_prepend(0.0, lps), (a, b) -> a + b) / len(lps), 6) AS logprob
       |FROM agg""".stripMargin

  // ------------------------------------------- q128 CCNet quality buckets
  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): within each
    * language, rank documents by LM score (q84's order-pinned unigram
    * logprob — higher = more fluent) and cut the ranking into head/middle/
    * tail TERTILES with integer cross-multiplied cuts (3r <= n -> head,
    * 3r <= 2n -> middle, else tail). The per-language relative cut is the
    * point: an absolute perplexity threshold would judge every language by
    * the majority language's fluency scale (the same argument as q102's
    * per-source gate). Output = per (lang, bucket) doc counts and the
    * bucket's logprob range — the thresholds a production filter would
    * freeze and reuse.
    *
    * 100 TB shape: q84's score (vocab-bounded aggs + broadcast total,
    * text never shuffles) + ONE lang-keyed rank window over
    * (logprob, doc_id) pairs + a lang-bucket agg — output is
    * #langs x 3 rows.
    */
  val q128_ccnet_buckets: Q = (s, dir) => {
    import s.implicits._
    val scored = q84_unigram_logprob(s, dir)
      .join(t(s, dir, "documents").select($"doc_id", $"lang"), "doc_id")
    val wR = Window.partitionBy($"lang").orderBy($"logprob".desc, $"doc_id".asc)
    val wN = Window.partitionBy($"lang")
    scored.withColumn("r", row_number().over(wR))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("bucket", when($"r" * 3 <= $"n", "head")
        .when($"r" * 3 <= $"n" * 2, "middle").otherwise("tail"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(min($"logprob"), 6).as("min_lp"),
        round(max($"logprob"), 6).as("max_lp"))
  }

  val q128_oracle: String =
    s"""WITH base AS (
       |$q84_oracle
       |),
       |d AS (SELECT b.doc_id, doc.lang, b.logprob
       |  FROM base b JOIN documents doc USING (doc_id)),
       |rk AS (SELECT doc_id, lang, logprob,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY logprob DESC, doc_id) AS r,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM d),
       |bk AS (SELECT lang, logprob,
       |    CASE WHEN 3 * r <= n THEN 'head'
       |         WHEN 3 * r <= 2 * n THEN 'middle'
       |         ELSE 'tail' END AS bucket
       |  FROM rk)
       |SELECT lang, bucket, count(*)::BIGINT AS n_docs,
       |  round(min(logprob), 6) AS min_lp, round(max(logprob), 6) AS max_lp
       |FROM bk GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------- q85 NFC clean
  /** Unicode-clean pass: NFC-normalize (native `graft_nfc` codegen
    * expression), strip control characters to spaces, collapse space runs,
    * trim — the first stage of every text-ingest pipeline, fingerprinted so
    * the differential check covers the exact output bytes. Pure row-local
    * projection: no shuffle at any scale.
    */
  val q85_nfc_clean: Q = (s, dir) => {
    import s.implicits._
    val clean = trim(regexp_replace(
      regexp_replace(T.nfcNormalize($"text"), "[\\x00-\\x1f\\x7f]", " "), " +", " "))
    t(s, dir, "documents")
      .select($"doc_id", length(clean).as("n_chars_clean"), md5(clean).as("clean_fp"))
  }

  val q85_oracle: String =
    """WITH c AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(nfc_normalize(text),
      |    '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS clean
      |  FROM documents)
      |SELECT doc_id, length(clean) AS n_chars_clean, md5(clean) AS clean_fp
      |FROM c""".stripMargin

  // --------------------------------------------- q86 cross-corpus near-dup
  /** Dedup a NEW document batch against an EXISTING corpus (the nightly-crawl
    * case): sources src10+ are "new", src0–src9 are the reference corpus; a
    * banded MinHash join (never all-pairs) surfaces new docs whose exact
    * token-hash Jaccard against some reference doc is ≥ 0.9.
    */
  val q86_cross_corpus_dedup: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", $"source", T.tokenSet($"text").as("toks"))
    val half = substring($"source", 4, 10).cast("int")
    val newDocs = docs.filter(half >= 10)
    val refDocs = docs.filter(half < 10)
    // broadcastNew demonstrates the plan shape the real nightly-batch case
    // wants (the reference corpus — the 100 TB side — is never shuffled).
    // Caveat stated honestly: THIS fixture's "new" side is half the corpus,
    // fine to replicate at gate scale; a production caller sizes the flag by
    // the rule in crossCorpusPairs' doc (banded signatures ≈ bands × tokens
    // × 8 B per doc) and leaves it false for large batches.
    D.crossCorpusPairs(newDocs, refDocs, "doc_id", "toks",
        hashes = 12, bands = 2, minJaccard = 0.9, broadcastNew = true)
      .select($"id_new", $"id_ref", $"jaccard")
  }

  val q86_oracle: String =
    s"""WITH ${TextQueries.lshSigCtes},
       |cand AS (
       |  SELECT DISTINCT n.doc_id AS id_new, r.doc_id AS id_ref,
       |    list_transform(n.hp, p -> p.h1) AS hs_n,
       |    list_transform(r.hp, p -> p.h1) AS hs_r
       |  FROM banded n JOIN banded r
       |    ON n.band = r.band
       |   AND CAST(substr(n.source, 4) AS INT) >= 10
       |   AND CAST(substr(r.source, 4) AS INT) < 10)
       |SELECT id_new, id_ref,
       |  len(list_intersect(hs_n, hs_r))::DOUBLE
       |    / len(list_distinct(list_concat(hs_n, hs_r))) AS jaccard
       |FROM cand
       |WHERE len(list_intersect(hs_n, hs_r))::DOUBLE
       |    / len(list_distinct(list_concat(hs_n, hs_r))) >= 0.9""".stripMargin

  // ------------------------------------------------ q88 length quantiles
  /** Corpus profiling: exact p50/p90/p99 document length per source (the
    * distribution sheet every ingest run prints). Exact `percentile` keeps a
    * per-group value→count map — right for bounded domains like char lengths;
    * for unbounded value domains the scale path is `approx_percentile`
    * (t-digest, fixed memory), spec'd against the exact result in
    * CorpusOpsSpec. Both engines interpolate continuously, results rounded
    * to 4 dp.
    */
  val q88_length_quantiles: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        round(percentile($"n_chars", lit(0.5)), 4).as("p50"),
        round(percentile($"n_chars", lit(0.9)), 4).as("p90"),
        round(percentile($"n_chars", lit(0.99)), 4).as("p99"))
  }

  val q88_oracle: String =
    """SELECT source, count(*) AS n_docs,
      |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
      |  round(quantile_cont(n_chars, 0.9), 4) AS p90,
      |  round(quantile_cont(n_chars, 0.99), 4) AS p99
      |FROM documents GROUP BY source""".stripMargin

  // ------------------------------------------- q89 contamination overlap
  /** Benchmark-contamination REPORT: per training document, the fraction of
    * its word-trigram shingles that appear in the held-out benchmark set —
    * the quantitative companion to q68's binary scrub (papers report overlap
    * distributions, thresholds get tuned on this). Same broadcast shape as
    * q68: the benchmark shingle set is tiny, the corpus scans once, shingles
    * never shuffle; zero-overlap documents are KEPT (that is the report's
    * point), so the join is left, not semi.
    */
  val q89_contamination_frac: Q = (s, dir) => {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .withColumn("th", T.tokenLongHashes($"text"))
      .select($"doc_id", T.shingleHashesFrom($"th", 3).as("sh"))
    // held-out "benchmark": every 20th doc (the q68 stand-in convention)
    val benchShingles = sh.filter($"doc_id" % 20 === 0)
      .select(explode_outer($"sh").as("h"))
      .filter($"h".isNotNull).distinct()
      .withColumn("hit", lit(1))
    sh.filter($"doc_id" % 20 =!= 0)
      // explode_outer keeps zero-shingle docs as a null-h row (no bench match)
      .select($"doc_id", size($"sh").as("n_sh"), explode_outer($"sh").as("h"))
      .join(broadcast(benchShingles), Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(max($"n_sh").as("n_shingles"),
        sum(coalesce($"hit", lit(0))).as("n_overlap"))
      .select($"doc_id", $"n_shingles", $"n_overlap",
        round(when($"n_shingles" > 0, $"n_overlap" / $"n_shingles")
          .otherwise(0.0), 6).as("overlap_frac"))
  }

  val q89_oracle: String =
    s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |th AS (SELECT doc_id,
       |  list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
       |  FROM toks),
       |sh AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(h) >= 3
       |    THEN list_transform(range(1, len(h) - 1), i -> h[i] * 4099 + h[i+1] * 31 + h[i+2])
       |    ELSE [] END) AS s
       |  FROM th),
       |bench AS (SELECT DISTINCT h FROM (
       |  SELECT unnest(s) AS h FROM sh WHERE doc_id % 20 = 0)),
       |ex AS (SELECT doc_id, len(s) AS n_sh,
       |         unnest(CASE WHEN len(s) = 0 THEN [NULL::BIGINT] ELSE s END) AS h
       |       FROM sh WHERE doc_id % 20 <> 0),
       |j AS (SELECT e.doc_id, e.n_sh,
       |        CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS hit
       |      FROM ex e LEFT JOIN bench b ON e.h = b.h)
       |SELECT doc_id, max(n_sh) AS n_shingles, sum(hit)::BIGINT AS n_overlap,
       |  round(CASE WHEN max(n_sh) > 0
       |    THEN sum(hit)::DOUBLE / max(n_sh) ELSE 0.0 END, 6) AS overlap_frac
       |FROM j GROUP BY doc_id""".stripMargin

  // --------------------------------------- q90 bloom-prefiltered decontam
  /** Exact-duplicate decontamination against a reference corpus via BLOOM
    * PREFILTER + EXACT CONFIRM: the reference half's fingerprints aggregate
    * into a bloom filter (Catalyst's own runtime-filter expressions, exposed
    * as `BloomFunctions`); training docs are prefiltered row-locally — no
    * false negatives, so nothing is missed — and survivors are exact-confirmed
    * with a semi-join, which removes the bloom's false positives. Output is
    * therefore EXACT and the oracle is the plain semi-join.
    *
    * Scale shape: at 100 TB the reference fingerprint set doesn't broadcast
    * as data, but its bloom does (a few hundred MB for billions of keys), and
    * the prefilter keeps all non-candidate rows out of the confirm shuffle.
    * At fixture scale the filter is collected as a scalar (model-sized, like
    * KMeansLite's centroids).
    */
  val q90_bloom_decontaminate: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.BloomFunctions
    // leading-passage fingerprint (first 16 tokens): the copied-opening
    // heuristic — the fixture's near-dups share openings but not full bodies,
    // so an exact full-text fingerprint would find nothing across the halves
    val fp = t(s, dir, "documents")
      .select($"doc_id", $"source",
        md5(concat_ws(" ", slice(T.tokens($"text"), 1, 16))).as("fp"))
    val half = substring($"source", 4, 10).cast("int")
    // the reference fingerprints feed two jobs (bloom agg + confirm join):
    // localCheckpoint materializes the tokenize+md5 pass ONCE — fp-only rows,
    // never corpus-sized — and the blocks free when the frame is GC'd (the
    // q74 pattern; a plain cache would pin a table per call)
    val ref = fp.filter(half < 10).select($"fp").localCheckpoint(true)
    val train = fp.filter(half >= 10)
    val bloomRow = ref.agg(BloomFunctions.bloomAgg($"fp", 100000L).as("bf")).first()
    if (bloomRow.isNullAt(0)) train.select($"doc_id", $"fp").limit(0)
    else {
      val bloom = lit(bloomRow.getAs[Array[Byte]](0))
      // no distinct() on ref: a left_semi join is insensitive to right-side
      // duplicates — deduping first would only add a shuffle
      train.filter(BloomFunctions.mightContain(bloom, $"fp"))
        .join(ref, Seq("fp"), "left_semi")
        .select($"doc_id", $"fp")
    }
  }

  val q90_oracle: String =
    s"""WITH f AS (SELECT doc_id, source,
       |  md5(array_to_string(($tokSql)[1:16], ' ')) AS fp FROM documents)
       |SELECT t.doc_id, t.fp FROM f t
       |WHERE CAST(substr(t.source, 4) AS INT) >= 10
       |  AND EXISTS (SELECT 1 FROM f r
       |    WHERE CAST(substr(r.source, 4) AS INT) < 10 AND r.fp = t.fp)""".stripMargin

  // ------------------------------------------- q92 source entropy/KL mix
  /** Data-mixing diagnostics: per-source unigram entropy and KL divergence
    * from the corpus-wide token distribution — the signals mixture-weight
    * tuning reads (a source with low entropy is repetitive; one with high KL
    * is off-distribution). Counts are exact integers; the float entropy/KL
    * sums use the q84 determinism contract: per-term rounding, then an
    * ordered fold (by token) on BOTH engines.
    *
    * Scale shape: two map-side-partial count aggs (per source+token, per
    * token), a join keyed on token, one fold agg per source — no corpus
    * re-scan, no driver loops.
    */
  val q92_source_entropy: Q = (s, dir) => {
    import s.implicits._
    val tc = t(s, dir, "documents")
      .select($"source", explode_outer(T.tokens($"text")).as("tok"))
      .filter($"tok".isNotNull)
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
    val st = tc.groupBy($"source").agg(sum($"c").as("src_total"))
    val cr = tc.groupBy($"tok").agg(sum($"c").as("cc"))
    val ct = cr.agg(sum($"cc").cast("double").as("corpus_total"))
    val p = $"c" / $"src_total".cast("double")
    val q = $"cc" / $"corpus_total"
    tc.join(st, "source").join(cr, "tok").crossJoin(broadcast(ct))
      .select($"source", $"tok", $"src_total",
        round(-p * log(p), 9).as("h"),
        round(p * log(p / q), 9).as("kl"))
      .groupBy($"source")
      .agg(max($"src_total").as("n_tokens"),
        sort_array(collect_list(struct($"tok", $"h", $"kl"))).as("terms"))
      .select($"source", $"n_tokens",
        round(aggregate(transform($"terms", x => x.getField("h")),
          lit(0.0), (a, b) => a + b), 6).as("entropy"),
        round(aggregate(transform($"terms", x => x.getField("kl")),
          lit(0.0), (a, b) => a + b), 6).as("kl_vs_corpus"))
  }

  // ------------------------------------- q95 temperature-scaled mix weights
  /** Temperature-scaled source sampling weights — the standard multilingual/
    * multi-source recipe (w_s ∝ p_s^α, α < 1 upsamples the tail): at α = 0.3
    * a 100× larger source gets only 100^0.3 ≈ 4× the sampling mass. This is
    * q71's inverse-proportional scheme generalized; the pair spans the
    * mixing-policy space a training-data pipeline actually uses. Token
    * totals are exact integer sums; the one floating reduction (the weight
    * denominator) is an order-pinned fold like q92.
    */
  val q95_mix_temperature: Q = (s, dir) => {
    import s.implicits._
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val withW = t(s, dir, "documents")
      .groupBy($"source")
      .agg(sum(size(T.tokens($"text")).cast("long")).as("src_tokens"))
      .select($"source", $"src_tokens",
        ($"src_tokens".cast("double") /
          sum($"src_tokens").over(all).cast("double")).as("p_raw"))
      .select($"source", $"src_tokens", $"p_raw",
        round(pow($"p_raw", 0.3), 9).as("w_raw"))
    val denom = withW.agg(
      aggregate(transform(sort_array(collect_list(struct($"source", $"w_raw"))),
        x => x.getField("w_raw")), lit(0.0), (a, b) => a + b).as("denom"))
    withW.crossJoin(broadcast(denom))
      .select($"source", $"src_tokens", round($"p_raw", 6).as("p_src"),
        round($"w_raw" / $"denom", 6).as("weight"))
  }

  val q95_oracle: String =
    s"""WITH sc AS (SELECT source, sum(len($tokSql))::BIGINT AS src_tokens
       |  FROM documents GROUP BY source),
       |p AS (SELECT source, src_tokens,
       |    src_tokens::DOUBLE / (SELECT sum(src_tokens) FROM sc)::DOUBLE AS p_raw
       |  FROM sc),
       |w AS (SELECT source, src_tokens, p_raw,
       |    round(pow(p_raw, 0.3), 9) AS w_raw FROM p),
       |d AS (SELECT list_reduce(list_prepend(0.0, list(w_raw ORDER BY source)),
       |    (a, b) -> a + b) AS denom FROM w)
       |SELECT source, src_tokens, round(p_raw, 6) AS p_src,
       |  round(w_raw / d.denom, 6) AS weight
       |FROM w, d""".stripMargin

  val q92_oracle: String =
    s"""WITH tok AS (SELECT source, unnest($tokSql) AS tok FROM documents),
       |tc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
       |st AS (SELECT source, sum(c)::BIGINT AS src_total FROM tc GROUP BY 1),
       |cr AS (SELECT tok, sum(c) AS cc FROM tc GROUP BY 1),
       |ct AS (SELECT sum(cc)::DOUBLE AS corpus_total FROM cr),
       |terms AS (SELECT t.source, t.tok, st.src_total,
       |    round(-(t.c / st.src_total::DOUBLE) * ln(t.c / st.src_total::DOUBLE), 9) AS h,
       |    round((t.c / st.src_total::DOUBLE)
       |      * ln((t.c / st.src_total::DOUBLE) / (cr.cc / ct.corpus_total)), 9) AS kl
       |  FROM tc t JOIN st USING (source) JOIN cr USING (tok) CROSS JOIN ct),
       |agg AS (SELECT source, max(src_total) AS n_tokens,
       |    list(h ORDER BY tok) AS hs, list(kl ORDER BY tok) AS ks
       |  FROM terms GROUP BY source)
       |SELECT source, n_tokens,
       |  round(list_reduce(list_prepend(0.0, hs), (a, b) -> a + b), 6) AS entropy,
       |  round(list_reduce(list_prepend(0.0, ks), (a, b) -> a + b), 6) AS kl_vs_corpus
       |FROM agg""".stripMargin

  // ------------------------------------------------------------- registry
  // ------------------------------------------- q110 mixture materialization
  /** Materialize the temperature mixture: q95 computes WEIGHTS; this op
    * actually draws the subsampled corpus. Per-source acceptance rate =
    * temperature weight normalized so the highest-weighted source keeps
    * everything (rate 1.0 — upsampling beyond 1 is epoch repetition, a
    * training-loop concern, not a corpus-materialization one); a document is
    * kept iff its seeded md5 uniform (`mix42:` + doc_id → first 8 hex digits
    * / 2^32, q101's reproducible-draw device) falls under its source's rate.
    * Deterministic: re-running yields the SAME subsample — the property that
    * makes the drawn corpus shardable and resumable.
    *
    * Scale shape: one narrow tokenize pass materialized (doc_id, source,
    * n_tokens only — the text never moves), a source-cardinality weight table
    * broadcast back, the accept test row-local, and one per-source agg. At
    * 100 TB the kept manifest (or the filter itself, fused into the next
    * pass) is the output; here the per-source audit (rate, kept docs/tokens)
    * is emitted for the oracle.
    */
  val q110_mixture_sample: Q = (s, dir) => {
    import s.implicits._
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    // narrow (id, source, tokens) frame once; both the weight fit and the
    // accept pass read it (q108's no-redundant-tokenize rule)
    val docTok = t(s, dir, "documents")
      .select($"doc_id", $"source", size(T.tokens($"text")).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val rates = docTok.groupBy($"source")
      .agg(sum($"n_tokens").cast("long").as("src_tokens"))
      .select($"source",
        ($"src_tokens".cast("double") /
          sum($"src_tokens").over(all).cast("double")).as("p_raw"))
      .select($"source", round(pow($"p_raw", 0.3), 9).as("w_raw"))
      .select($"source", round($"w_raw" / max($"w_raw").over(all), 6).as("rate"))
    val kept = docTok.join(broadcast(rates), "source")
      .withColumn("h",
        T.md5PrefixLong(concat(lit("mix42:"), $"doc_id".cast("string"))))
      .filter($"h" / lit(4294967296.0) < $"rate")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs_kept"), sum($"n_tokens").cast("long").as("tokens_kept"))
    rates.join(kept, Seq("source"), "left")
      .select($"source", $"rate",
        coalesce($"n_docs_kept", lit(0L)).as("n_docs_kept"),
        coalesce($"tokens_kept", lit(0L)).as("tokens_kept"))
  }

  val q110_oracle: String =
    s"""WITH dt AS (SELECT doc_id, source, len($tokSql)::BIGINT AS n_tokens
       |  FROM documents),
       |sc AS (SELECT source, sum(n_tokens)::BIGINT AS src_tokens FROM dt GROUP BY source),
       |p AS (SELECT source,
       |    src_tokens::DOUBLE / (SELECT sum(src_tokens) FROM sc)::DOUBLE AS p_raw
       |  FROM sc),
       |w AS (SELECT source, round(pow(p_raw, 0.3), 9) AS w_raw FROM p),
       |r AS (SELECT source, round(w_raw / (SELECT max(w_raw) FROM w), 6) AS rate FROM w),
       |acc AS (SELECT d.source, d.n_tokens FROM dt d JOIN r ON d.source = r.source
       |  WHERE ('0x' || substr(md5('mix42:' || d.doc_id::VARCHAR), 1, 8))::BIGINT
       |    / 4294967296.0 < r.rate),
       |k AS (SELECT source, count(*) AS n_docs_kept, sum(n_tokens)::BIGINT AS tokens_kept
       |  FROM acc GROUP BY source)
       |SELECT r.source, r.rate,
       |  coalesce(k.n_docs_kept, 0) AS n_docs_kept,
       |  coalesce(k.tokens_kept, 0) AS tokens_kept
       |FROM r LEFT JOIN k ON r.source = k.source""".stripMargin

  // --------------------------------------------- q122 Zipf slope per source
  /** Zipf rank-frequency slope per source: fit ln(freq) ~ ln(rank) by least
    * squares over each source's top-200 token ranks. Natural text sits near
    * slope -1; a source whose slope is far off (too flat = boilerplate/
    * template spam, too steep = tiny degenerate vocabulary) is a corpus-mix
    * red flag — the distributional health check that runs alongside the
    * entropy/KL diagnostics (q92). Float discipline: x=ln(rank), y=ln(freq)
    * round to 6dp per term (the q103 contract), the four moment sums fold in
    * rank order, and the slope rounds at output.
    *
    * 100 TB shape: one vocabulary-bounded count agg, a source-keyed rank
    * window over the vocab (not the corpus), a 200-row-per-source fold —
    * output is source-cardinality-sized. Text never shuffles.
    */
  val q122_zipf_slope: Q = (s, dir) => {
    import s.implicits._
    val cnt = t(s, dir, "documents")
      .select($"source", explode(T.tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"source").orderBy($"c".desc, $"tok".asc)
    val ranked = cnt.withColumn("r", row_number().over(w)).filter($"r" <= 200)
      .select($"source", $"r",
        round(log($"r".cast("double")), 6).as("x"),
        round(log($"c".cast("double")), 6).as("y"))
    ranked.groupBy($"source")
      .agg(sort_array(collect_list(struct($"r", $"x", $"y"))).as("ps"))
      .select($"source", size($"ps").cast("long").as("n_ranks"),
        aggregate(transform($"ps", p => p("x")), lit(0.0), (a, b) => a + b).as("sx"),
        aggregate(transform($"ps", p => p("y")), lit(0.0), (a, b) => a + b).as("sy"),
        aggregate(transform($"ps", p => p("x") * p("x")), lit(0.0), (a, b) => a + b).as("sxx"),
        aggregate(transform($"ps", p => p("x") * p("y")), lit(0.0), (a, b) => a + b).as("sxy"))
      // n_ranks == 1 makes the denominator exactly 0: Spark yields NaN while
      // DuckDB's float-div-by-zero result is a setting-dependent NULL/NaN, so
      // a degenerate single-token source would break the differential hash.
      // A slope needs two points anyway.
      .filter($"n_ranks" >= 2)
      .select($"source", $"n_ranks",
        round(($"n_ranks" * $"sxy" - $"sx" * $"sy") /
          ($"n_ranks" * $"sxx" - $"sx" * $"sx"), 6).as("zipf_slope"))
  }

  val q122_oracle: String =
    s"""WITH cnt AS (SELECT source, t AS tok, count(*)::BIGINT AS c
       |  FROM (SELECT source, unnest($tokSql) AS t FROM documents) GROUP BY 1, 2),
       |rk AS (SELECT source, c,
       |    row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS r
       |  FROM cnt QUALIFY r <= 200),
       |xy AS (SELECT source, r, round(ln(r::DOUBLE), 6) AS x,
       |    round(ln(c::DOUBLE), 6) AS y FROM rk),
       |fold AS (SELECT source, count(*)::BIGINT AS n_ranks,
       |    list_reduce(list_prepend(0.0, list(x ORDER BY r)), (a, b) -> a + b) AS sx,
       |    list_reduce(list_prepend(0.0, list(y ORDER BY r)), (a, b) -> a + b) AS sy,
       |    list_reduce(list_prepend(0.0, list(x * x ORDER BY r)), (a, b) -> a + b) AS sxx,
       |    list_reduce(list_prepend(0.0, list(x * y ORDER BY r)), (a, b) -> a + b) AS sxy
       |  FROM xy GROUP BY source)
       |SELECT source, n_ranks,
       |  round((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 6)
       |    AS zipf_slope
       |FROM fold WHERE n_ranks >= 2""".stripMargin

  // ------------------------------- q125 stratified split + leakage audit
  /** Deterministic stratified train/val/test split with a cross-split
    * leakage audit — the two things every training pipeline must get right
    * before a single step runs. Split: per-source rank over a seeded md5
    * (q101's shuffle recipe) with integer cross-multiplied cuts
    * (10r <= n -> test, 10r <= 2n -> val, else train), so every source lands
    * EXACT 10/10/80 proportions, not just in expectation. Audit: any
    * fingerprint (md5 of the raw text) that appears in more than one split
    * is counted as leaked in every split it touches — the exact-dup
    * cross-split contamination a random split silently admits (near-dup
    * escalation = q86's cross-corpus MinHash with splits as the corpora).
    *
    * 100 TB shape: the rank window sorts each SOURCE's (hkey, doc_id) pairs
    * -- 48 bytes/doc, text never shuffles; sources bigger than a partition
    * sort fall back to the rank-free hash-threshold split (proportions then
    * exact only in expectation — the documented trade). The leak audit
    * shuffles fingerprints (32 hex chars), min/max-over-fp window, one agg.
    */
  val q125_split_manifest: Q = (s, dir) => {
    import s.implicits._
    val base = t(s, dir, "documents")
      .select($"doc_id", $"source",
        md5(concat(lit("split42:"), $"doc_id".cast("string"))).as("hkey"),
        md5($"text").as("fp"))
    val wS = Window.partitionBy($"source").orderBy($"hkey", $"doc_id")
    val wN = Window.partitionBy($"source")
    val sp = base
      .withColumn("r", row_number().over(wS))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("split",
        when($"r" * 10 <= $"n", "test")
          .when($"r" * 10 <= $"n" * 2, "val")
          .otherwise("train"))
    val wF = Window.partitionBy($"fp")
    sp.withColumn("leaked", min($"split").over(wF) =!= max($"split").over(wF))
      .groupBy($"split", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"leaked", 1L).otherwise(0L)).as("n_leaked"))
  }

  val q125_oracle: String =
    s"""WITH base AS (SELECT doc_id, source,
       |    md5('split42:' || doc_id::VARCHAR) AS hkey, md5(text) AS fp
       |  FROM documents),
       |rk AS (SELECT doc_id, source, fp,
       |    row_number() OVER (PARTITION BY source ORDER BY hkey, doc_id) AS r,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM base),
       |sp AS (SELECT doc_id, source, fp,
       |    CASE WHEN r * 10 <= n THEN 'test'
       |         WHEN r * 10 <= n * 2 THEN 'val'
       |         ELSE 'train' END AS split
       |  FROM rk),
       |lk AS (SELECT split, source,
       |    min(split) OVER (PARTITION BY fp) <> max(split) OVER (PARTITION BY fp)
       |      AS leaked
       |  FROM sp)
       |SELECT split, source, count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN leaked THEN 1 ELSE 0 END)::BIGINT AS n_leaked
       |FROM lk GROUP BY 1, 2""".stripMargin

  // ------------------------------ q135 end-to-end corpus assembly funnel
  /** The full corpus-assembly chain as ONE composable query — quality gate,
    * exact dedup, token-budget selection — with a per-source funnel report
    * (rows surviving each stage), the shape a data team reviews before a
    * training run. Stages: (1) integer-exact quality gate (>= 20 tokens,
    * lexical diversity 10*distinct >= 3*total — the q115/q102 style, no
    * float boundary); (2) exact dedup keeping the smallest doc_id per text
    * fingerprint (q35's recipe); (3) q97's per-source token budget (600,
    * longest-first). Every stage is deterministic and integer-exact, so the
    * oracle replays the entire chain and a divergence ANYWHERE in the
    * composition fails the hash — this is the composability proof, not a
    * new primitive.
    *
    * 100 TB shape: stage 1 is row-local; stage 2 shuffles 32-hex
    * fingerprints; stage 3 is q97's source-keyed window; the report joins
    * are source-cardinality-sized. Text never shuffles.
    */
  val q135_assembly_funnel: Q = (s, dir) => {
    import s.implicits._
    val docs = t(s, dir, "documents")
      .select($"doc_id", $"source", $"text",
        size(T.tokens($"text")).cast("long").as("nt"),
        size(T.tokenSet($"text")).cast("long").as("nd"))
    val filtered = docs.filter($"nt" >= 20 && $"nd" * 10 >= $"nt" * 3)
    val deduped = filtered
      .withColumn("fp", md5($"text"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"fp").orderBy($"doc_id")))
      .filter($"rk" === 1)
    val wB = Window.partitionBy($"source").orderBy($"nt".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val selected = deduped.withColumn("cum", sum($"nt").over(wB))
      .filter($"cum" <= 600L)
    val f = filtered.groupBy($"source").agg(count(lit(1)).as("n_after_filter"))
    val d = deduped.groupBy($"source").agg(count(lit(1)).as("n_after_dedup"))
    val sel = selected.groupBy($"source")
      .agg(count(lit(1)).as("n_selected"), sum($"nt").as("tokens_selected"))
    f.join(d, Seq("source"), "left").join(sel, Seq("source"), "left")
      .select($"source", $"n_after_filter",
        coalesce($"n_after_dedup", lit(0L)).as("n_after_dedup"),
        coalesce($"n_selected", lit(0L)).as("n_selected"),
        coalesce($"tokens_selected", lit(0L)).as("tokens_selected"))
  }

  val q135_oracle: String =
    s"""WITH d0 AS (SELECT doc_id, source, text, len($tokSql)::BIGINT AS nt,
       |    len(list_distinct($tokSql))::BIGINT AS nd FROM documents),
       |f AS (SELECT * FROM d0 WHERE nt >= 20 AND nd * 10 >= nt * 3),
       |dd AS (SELECT * FROM (SELECT f.*, row_number() OVER (
       |    PARTITION BY md5(text) ORDER BY doc_id) AS rk FROM f)
       |  WHERE rk = 1),
       |sel AS (SELECT * FROM (SELECT dd.*, sum(nt) OVER (PARTITION BY source
       |      ORDER BY nt DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM dd)
       |  WHERE cum <= 600),
       |fc AS (SELECT source, count(*)::BIGINT AS n_after_filter FROM f GROUP BY 1),
       |dc AS (SELECT source, count(*)::BIGINT AS n_after_dedup FROM dd GROUP BY 1),
       |sc AS (SELECT source, count(*)::BIGINT AS n_selected,
       |    sum(nt)::BIGINT AS tokens_selected FROM sel GROUP BY 1)
       |SELECT fc.source, fc.n_after_filter,
       |  coalesce(dc.n_after_dedup, 0) AS n_after_dedup,
       |  coalesce(sc.n_selected, 0) AS n_selected,
       |  coalesce(sc.tokens_selected, 0) AS tokens_selected
       |FROM fc LEFT JOIN dc ON fc.source = dc.source
       |LEFT JOIN sc ON fc.source = sc.source""".stripMargin

  val entries: Map[String, Q] = Map(
    "q135_assembly_funnel" -> q135_assembly_funnel,
    "q125_split_manifest" -> q125_split_manifest,
    "q128_ccnet_buckets" -> q128_ccnet_buckets,
    "q122_zipf_slope" -> q122_zipf_slope,
    "q110_mixture_sample" -> q110_mixture_sample,
    "q82_sentence_dedup" -> q82_sentence_dedup,
    "q83_heavy_hitters" -> q83_heavy_hitters,
    "q84_unigram_logprob" -> q84_unigram_logprob,
    "q85_nfc_clean" -> q85_nfc_clean,
    "q86_cross_corpus_dedup" -> q86_cross_corpus_dedup,
    "q88_length_quantiles" -> q88_length_quantiles,
    "q89_contamination_frac" -> q89_contamination_frac,
    "q90_bloom_decontaminate" -> q90_bloom_decontaminate,
    "q92_source_entropy" -> q92_source_entropy,
    "q95_mix_temperature" -> q95_mix_temperature)

  val oracles: Map[String, String] = Map(
    "q125_split_manifest" -> q125_oracle,
    "q135_assembly_funnel" -> q135_oracle,
    "q128_ccnet_buckets" -> q128_oracle,
    "q122_zipf_slope" -> q122_oracle,
    "q110_mixture_sample" -> q110_oracle,
    "q82_sentence_dedup" -> q82_oracle,
    "q83_heavy_hitters" -> q83_oracle,
    "q84_unigram_logprob" -> q84_oracle,
    "q85_nfc_clean" -> q85_oracle,
    "q86_cross_corpus_dedup" -> q86_oracle,
    "q88_length_quantiles" -> q88_oracle,
    "q89_contamination_frac" -> q89_oracle,
    "q90_bloom_decontaminate" -> q90_oracle,
    "q92_source_entropy" -> q92_oracle,
    "q95_mix_temperature" -> q95_oracle)
}
