package graft.queries

import graft.Tables
import graft.functions.{DedupFunctions => D, TextFunctions => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline text operators over the `documents` fixture: wordcount, token
  * statistics, quality scoring, language-ID, fingerprinting, exact + MinHash/LSH +
  * SimHash + n-gram-Jaccard dedup. Every query is backed by a DuckDB oracle that
  * replays the identical md5-based hashing, so the check is exact, not statistical.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** Shared tokenizer SQL for the oracles (mirror of TextFunctions.tokens). */
  private[queries] val tokSql = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"

  // ---------------------------------------------------------- q30 wordcount
  /** The canonical Jet example (examples/wordcount): flatMap + groupBy + count.
    * `explode` of a row-local split, then a single hash-agg shuffle on the word.
    */
  val q30_wordcount: Q = (s, dir) => {
    import s.implicits._
    // explode_outer, not explode: InferFiltersFromGenerate turns a plain
    // explode into a pushed-down `size(arr) > 0` filter with the generator
    // input INLINED — the tokenizer would run twice per row (and for nested
    // expensive arrays like q68's shingles, O(n²) times). The rule skips
    // outer generates; the null row an empty array produces is dropped by
    // the explicit filter on the generated column, which cannot be pushed
    // below the Generate.
    t(s, dir, "documents")
      .select(explode_outer(T.tokens($"text")).as("word"))
      .filter($"word".isNotNull)
      .groupBy($"word")
      .agg(count(lit(1)).as("n"))
  }

  val q30_oracle: String =
    s"""SELECT word, count(*) AS n FROM (
       |  SELECT unnest($tokSql) AS word FROM documents)
       |GROUP BY word""".stripMargin

  // --------------------------------------------------------- q31 token stats
  val q31_token_stats: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id",
        T.wsTokenCount($"text").as("n_ws_tokens"),
        size(T.tokenSet($"text")).as("n_distinct_tokens"),
        length($"text").as("n_chars_actual"))
  }

  val q31_oracle: String =
    s"""SELECT doc_id,
       |  len(list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS n_ws_tokens,
       |  len(list_distinct($tokSql)) AS n_distinct_tokens,
       |  length(text) AS n_chars_actual
       |FROM documents""".stripMargin

  // ------------------------------------------------------- q32 quality score
  private val enStop = T.langStopwords("en")

  val q32_quality_score: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", T.qualityScore($"text", enStop).as("quality"))
  }

  /** Shared quality-score SQL over a `ts` tokens list + `text` column — the
    * mirror of TextFunctions.qualityScoreFrom, defined ONCE so the q32 and
    * q48 oracles can never drift apart on just one of them.
    */
  private val qualityExprSql: String = {
    val stopList = enStop.map(w => s"'$w'").mkString("[", ",", "]")
    s"""least(1.0, greatest(0.0,
       |    0.4 * (CASE WHEN len(ts) >= 10 AND len(ts) <= 10000 THEN 1.0
       |                WHEN len(ts) > 0 THEN 0.5 ELSE 0.0 END)
       |    + 0.4 * least(1.0, (CASE WHEN len(ts) > 0
       |        THEN len(list_filter(ts, x -> list_contains($stopList, x)))::DOUBLE / len(ts)
       |        ELSE 0.0 END) * 5)
       |    + 0.2 * (1.0 - least(1.0, (CASE WHEN length(text) > 0
       |        THEN (length(text) - length(regexp_replace(text, '[!"#$$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')))::DOUBLE / length(text)
       |        ELSE 0.0 END) * 10))
       |  ))""".stripMargin
  }

  val q32_oracle: String =
    s"""WITH toks AS (SELECT doc_id, text, $tokSql AS ts FROM documents)
       |SELECT doc_id,
       |  $qualityExprSql AS quality
       |FROM toks""".stripMargin

  // ----------------------------------------------------------- q33 lang id
  val q33_lang_id: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id", $"lang".as("declared_lang"), T.langId($"text").as("predicted_lang"))
  }

  val q33_oracle: String = {
    val structs = T.langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ",", "]")
      s"{'hits': len(list_filter(ts, x -> list_contains($lst, x))), 'lang': '$lang'}"
    }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, lang, $tokSql AS ts FROM documents),
       |best AS (SELECT doc_id, lang, list_max([$structs]) AS b FROM toks)
       |SELECT doc_id, lang AS declared_lang,
       |  CASE WHEN b.hits > 0 THEN b.lang ELSE 'und' END AS predicted_lang
       |FROM best""".stripMargin
  }

  // -------------------------------------------------------- q34 fingerprints
  val q34_fingerprint: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .select($"doc_id",
        T.exactFingerprint($"text").as("exact_fp"),
        T.rollingFingerprint($"text").as("rolling_fp"))
  }

  val q34_oracle: String =
    s"""WITH toks AS (SELECT doc_id, $tokSql AS ts FROM documents)
       |SELECT doc_id,
       |  md5(array_to_string(ts, ' ')) AS exact_fp,
       |  list_reduce(list_prepend(0::BIGINT, list_transform(ts, t ->
       |    (strpos('0123456789abcdef', md5(t)[1]) - 1) * 4096
       |    + (strpos('0123456789abcdef', md5(t)[2]) - 1) * 256
       |    + (strpos('0123456789abcdef', md5(t)[3]) - 1) * 16
       |    + (strpos('0123456789abcdef', md5(t)[4]) - 1))),
       |    (acc, v) -> (acc * 1000003 + v) % 2147483647) AS rolling_fp
       |FROM toks""".stripMargin

  // ------------------------------------------------------- q35 exact dedup
  /** Exact dedup via hash-groupBy on the normalized-text fingerprint: per source,
    * how many docs and how many distinct texts survive. At scale this is one
    * hash agg on the md5 key — the standard exact-dedup pass.
    */
  val q35_dedup_exact: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "documents")
      .withColumn("fp", T.exactFingerprint($"text"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_distinct"),
        (count(lit(1)) - countDistinct($"fp")).as("n_dupes"))
  }

  val q35_oracle: String =
    s"""WITH fp AS (SELECT source, md5(array_to_string($tokSql, ' ')) AS f FROM documents)
       |SELECT source, count(*) AS n_docs, count(DISTINCT f) AS n_distinct,
       |  count(*) - count(DISTINCT f) AS n_dupes
       |FROM fp GROUP BY source""".stripMargin

  // -------------------------------------------------- q36 minhash LSH dedup
  /** MinHash + LSH banding near-dup detection: 12 seeded md5 min-hashes over the
    * unigram token set, 2 bands × 6 rows; candidates sharing any band within the
    * same `source` shard are verified with exact Jaccard ≥ 0.9. Scoping the LSH
    * join per source keeps bucket fan-out bounded at scale (shard-local dedup);
    * the oracle replays the exact same hashes, so the result is deterministic.
    */
  val q36_dedup_minhash_lsh: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", $"source", T.tokenSet($"text").as("toks"))
    D.candidatePairs(docs, "doc_id", "toks", hashes = 12, bands = 2, minJaccard = 0.9,
        scopeCols = Seq("source"))
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"), $"jaccard")
  }

  /** Shared oracle CTEs building banded MinHash signatures (q36 + q47 + the
    * cross-corpus q86, which swaps in its own candidate join).
    */
  private[queries] val lshSigCtes: String = {
    val sig = (0 until 12).map(i =>
      s"list_min(list_transform(hp, p -> (p.h1 + $i * p.h2) % 4294967311))")
      .mkString("[", ", ", "]")
    val bands = (0 until 2).map { b =>
      val cat = (0 until 6).map(r => s"sig[${6 * b + r + 1}]").mkString(" || '|' || ")
      s"md5('band$b:' || $cat)"
    }.mkString("[", ", ", "]")
    s"""toks AS (SELECT doc_id, source, list_distinct($tokSql) AS ts FROM documents),
       |hashed AS (SELECT doc_id, source, ts,
       |  list_transform(ts, t -> {'h1': ('0x' || substr(md5(t), 1, 8))::BIGINT,
       |                           'h2': ('0x' || substr(md5(t), 9, 8))::BIGINT}) AS hp
       |  FROM toks),
       |sigs AS (SELECT doc_id, source, hp, $sig AS sig FROM hashed),
       |banded AS (SELECT doc_id, source, hp, unnest($bands) AS band FROM sigs)""".stripMargin
  }

  /** Full oracle CTE chain for the self-join pair pipeline (q36 + q47). */
  private val lshPairsCtes: String = {
    s"""$lshSigCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    list_transform(a.hp, p -> p.h1) AS hs_a,
       |    list_transform(b.hp, p -> p.h1) AS hs_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.source = b.source AND a.doc_id < b.doc_id)""".stripMargin
  }

  private val lshPairsSelect: String =
    """SELECT doc_a, doc_b,
      |  len(list_intersect(hs_a, hs_b))::DOUBLE
      |    / len(list_distinct(list_concat(hs_a, hs_b))) AS jaccard
      |FROM cand
      |WHERE len(list_intersect(hs_a, hs_b))::DOUBLE
      |    / len(list_distinct(list_concat(hs_a, hs_b))) >= 0.9""".stripMargin

  val q36_oracle: String = s"WITH $lshPairsCtes\n$lshPairsSelect"

  // ------------------------------------ q130 dedup-graph PageRank centrality
  /** PageRank centrality over the near-dup graph — the principled way to pick
    * each dup cluster's REPRESENTATIVE: the doc most connected to the rest of
    * its cluster (q73 keeps "best by quality score"; this keeps "most
    * central", which survives when quality metadata is missing or gamed).
    * Edges = q36's source-scoped LSH candidate pairs (Jaccard >= 0.9),
    * undirected; 3 damped iterations (d = 0.85) restricted to nodes with at
    * least one edge. Float discipline: per-node neighbor contributions fold
    * in neighbor-id order, each iteration's rank rounds to 12dp (so
    * cross-engine ulp drift cannot compound), output rounds to 6dp. Output =
    * top-10 most-central docs with degree.
    *
    * 100 TB shape: the edge list (already bounded by the LSH band join — no
    * all-pairs) is localCheckpointed once and reused; every iteration is one
    * edge-keyed join + one node-keyed fold agg — graph-sized, not
    * corpus-sized; node count broadcasts. The iterative-loop pattern matches
    * q47's CC (pointer jumping) with rank flowing instead of labels.
    */
  val q130_dedup_pagerank: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", $"source", T.tokenSet($"text").as("toks"))
    val pairs = D.candidatePairs(docs, "doc_id", "toks", hashes = 12, bands = 2,
        minJaccard = 0.9, scopeCols = Seq("source"))
      .select($"id_a", $"id_b").localCheckpoint(true)
    val edges = pairs.select($"id_a".as("src"), $"id_b".as("dst"))
      .unionByName(pairs.select($"id_b".as("src"), $"id_a".as("dst")))
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select($"src".as("node")).distinct()
    val nDf = broadcast(nodes.agg(count(lit(1)).as("n")))
    var p = nodes.crossJoin(nDf).select($"node", (lit(1.0) / $"n").as("p"))
    for (_ <- 1 to 3) {
      p = edges.join(p.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select($"dst", $"src", ($"p" / $"deg").as("w"))
        .groupBy($"dst")
        .agg(sort_array(collect_list(struct($"src", $"w"))).as("ws"))
        .crossJoin(nDf)
        .select($"dst".as("node"),
          round(lit(0.15) / $"n" + lit(0.85) *
            aggregate(transform($"ws", x => x.getField("w")),
              lit(0.0), (a, b) => a + b), 12).as("p"))
    }
    p.join(deg, p("node") === deg("src"))
      .select($"node".as("doc_id"), $"deg".as("degree"),
        round($"p", 6).as("pagerank"))
      .orderBy($"pagerank".desc, $"doc_id".asc)
      .limit(10)
  }

  val q130_oracle: String = {
    def iter(nxt: String, prev: String) =
      s"""$nxt AS (SELECT e.dst AS node,
         |    round(0.15::DOUBLE / (SELECT n FROM nn) + 0.85::DOUBLE *
         |      list_reduce(list_prepend(0.0, list(pp.p / deg.deg ORDER BY e.src)),
         |        (a, b) -> a + b), 12) AS p
         |  FROM e JOIN $prev pp ON e.src = pp.node JOIN deg ON e.src = deg.src
         |  GROUP BY e.dst)""".stripMargin
    s"""WITH $lshPairsCtes,
       |pairs AS ($lshPairsSelect),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM e),
       |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
       |deg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY 1),
       |p0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS p FROM nodes),
       |${iter("p1", "p0")},
       |${iter("p2", "p1")},
       |${iter("p3", "p2")}
       |SELECT p3.node AS doc_id, deg.deg AS degree, round(p3.p, 6) AS pagerank
       |FROM p3 JOIN deg ON p3.node = deg.src
       |ORDER BY pagerank DESC, doc_id LIMIT 10""".stripMargin
  }

  // ------------------------------------------ q134 LSH dedup recall audit
  /** LSH recall audit for the dedup family — the q74 (ANN) discipline
    * applied to MinHash banding: ground truth = EXACT token-set Jaccard over
    * all source-scoped pairs with an integer cross-multiplied threshold
    * (10|A∩B| >= 9|A∪B|, no float boundary); detected = q36's banded
    * candidate pipeline. Reports true pairs, detected pairs, hits, and
    * recall — the measured answer to "how many dups does banding miss at
    * these (hashes, bands) settings", which turns the LSH sizing arithmetic
    * (planesForCorpus / ScaleSizingSpec) from theory into a number.
    *
    * 100 TB shape: ground truth is an ALL-PAIRS join, affordable only
    * because (a) the source scope bounds each bucket and (b) the audit runs
    * on a DETERMINISTIC HASH-SAMPLE of scopes (seeded md5 of the source,
    * 1-in-5 here) — the quadratic cost is paid on a sliver, the recall
    * estimate generalizes because banding treats every scope identically.
    * The detected side is exactly q36's plan restricted to the same sample.
    * The 10x trend measured the unsampled variant at 6.3x growth (all-pairs
    * quadratic in scope size); the sample keeps the audit constant-fraction.
    */
  val q134_lsh_recall_audit: Q = (s, dir) => lshRecallAudit(s, dir, docMod = 1)

  /** Baseline per-scope population the audit's doc-sample modulus is
    * calibrated against: the sf0.1 gate fixture (5000 docs over 20 sources =
    * 250 docs/scope), where docMod=1 — no sampling — is the measured-good
    * operating point.
    */
  private val baseScopePop = 250.0

  /** The deterministic 1-in-5 scope hash-sample the audit runs on — shared
    * by the audit itself and the default form's sizing statistic.
    */
  private def auditScopeSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.fanOutScan(t(s, dir, "documents"))
      .filter(pmod(T.md5PrefixLong(concat(lit("audit42:"), $"source")),
        lit(5)) === 0L)
  }

  /** DEFAULT recall-audit API (VERDICT r16 task 1): the within-scope
    * doc-sample modulus is DERIVED from a cheap per-scope count over the
    * sampled scopes via [[graft.functions.SimilarityFunctions
    * .sampleModForScope]] — per-scope populations return to the calibrated
    * shape whatever the corpus size, so the quadratic all-pairs truth side
    * stays constant-cost (fixed docMod=1 measured 1587× growth at the 100×
    * rung; this rule's docMod=100 measured 1.4×). At the oracle-gate
    * fixtures (≤ 250 docs/scope) the derived modulus is 1, identical to the
    * pinned [[q134_lsh_recall_audit]] form whose DuckDB oracle replays the
    * unsampled scopes.
    */
  def lshRecallAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pops = auditScopeSample(s, dir)
      .groupBy($"source").agg(count(lit(1)).as("n"))
      .agg(avg($"n")).head()
    val avgPop = if (pops.isNullAt(0)) 0.0 else pops.getDouble(0)
    lshRecallAudit(s, dir, docMod =
      graft.functions.SimilarityFunctions.sampleModForScope(avgPop, baseScopePop))
  }

  /** q134 with the within-scope doc-sample modulus as an explicit parameter —
    * the audit's scale lever at big rungs. Scope-sampling alone cannot keep
    * the audit constant-cost when corpus growth lands INSIDE existing scopes
    * (the fixture's 20 sources hold 100× the docs at the 100× replica, so
    * the sampled scopes' all-pairs term is 10,000×: measured 1587× battery
    * growth). A deterministic hash-sample of docs within the sampled scopes,
    * `docMod` ~ the growth factor, returns per-scope populations to the 1×
    * shape — the recall estimate stays unbiased because banding treats every
    * doc identically and BOTH the truth and detected sides see the same
    * sample. docMod=1 is the gate form (no doc filter, plan unchanged).
    */
  def lshRecallAudit(s: SparkSession, dir: String, docMod: Int): DataFrame = {
    import s.implicits._
    val scoped = auditScopeSample(s, dir)
    val sampled =
      if (docMod <= 1) scoped
      else scoped.filter(pmod(
        T.md5PrefixLong(concat(lit("auditdoc:"), $"doc_id".cast("string"))),
        lit(docMod)) === 0L)
    val docs = sampled
      .select($"doc_id", $"source", T.tokenSet($"text").as("ts"))
    val a = docs.select($"source", $"doc_id".as("da"), $"ts".as("tsa"))
    val b = docs.select($"source", $"doc_id".as("db"), $"ts".as("tsb"))
    val truth = a.join(b, Seq("source")).filter($"da" < $"db")
      .filter(size(array_intersect($"tsa", $"tsb")) * 10 >=
        size(array_union($"tsa", $"tsb")) * 9)
      .select($"da", $"db").localCheckpoint(true)
    val det = D.candidatePairs(docs.withColumnRenamed("ts", "toks"),
        "doc_id", "toks", hashes = 12, bands = 2, minJaccard = 0.9,
        scopeCols = Seq("source"))
      .select($"id_a".as("da"), $"id_b".as("db")).localCheckpoint(true)
    val nTrue = truth.count()
    val nDet = det.count()
    val nHit = truth.join(det, Seq("da", "db")).count()
    Seq((nTrue, nDet, nHit,
      BigDecimal(if (nTrue == 0) 1.0 else nHit.toDouble / nTrue)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_true_pairs", "n_detected_pairs", "n_hit", "recall")
  }

  val q134_oracle: String =
    s"""WITH $lshPairsCtes,
       |samp AS (SELECT DISTINCT source FROM documents
       |  WHERE ('0x' || substr(md5('audit42:' || source), 1, 8))::BIGINT % 5 = 0),
       |det0 AS ($lshPairsSelect),
       |det AS (SELECT det0.* FROM det0
       |  JOIN documents da ON det0.doc_a = da.doc_id
       |  WHERE da.source IN (SELECT source FROM samp)),
       |tt AS (SELECT doc_id, source, ts FROM toks
       |  WHERE source IN (SELECT source FROM samp)),
       |truth AS (SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM tt a JOIN tt b ON a.source = b.source AND a.doc_id < b.doc_id
       |  WHERE 10 * len(list_intersect(a.ts, b.ts)) >=
       |        9 * len(list_distinct(list_concat(a.ts, b.ts)))),
       |hit AS (SELECT count(*)::BIGINT AS n FROM truth t
       |  JOIN det d ON t.da = d.doc_a AND t.db = d.doc_b)
       |SELECT (SELECT count(*) FROM truth)::BIGINT AS n_true_pairs,
       |  (SELECT count(*) FROM det)::BIGINT AS n_detected_pairs,
       |  (SELECT n FROM hit) AS n_hit,
       |  round(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1.0::DOUBLE
       |    ELSE (SELECT n FROM hit)::DOUBLE / (SELECT count(*) FROM truth)
       |    END, 6) AS recall""".stripMargin

  // ---------------------------------------- q141 dedup-graph triangle census
  /** Triangle census + global transitivity of the near-dup graph — the
    * structural health check for dedup clustering: near-dup relations are
    * approximately transitive, so a HIGH transitivity says the LSH graph is
    * capturing coherent duplicate groups, while a low value says the
    * threshold is admitting accidental bridges that q47's connected
    * components would then over-merge. Triangles via the canonical
    * ordered 3-way edge join (every edge stored a<b, each triangle counted
    * once); wedges = sum over nodes of C(deg, 2), integer-exact;
    * transitivity = 3T / W rounded at output.
    *
    * 100 TB shape: the edge list is LSH-bounded (never all-pairs); the
    * triangle join keys on edge endpoints — worst case is bounded by the
    * max per-node degree, which the mega-bucket cap already bounds
    * upstream; wedge counting is one degree agg. All graph-sized.
    */
  val q141_dedup_graph_stats: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", $"source", T.tokenSet($"text").as("toks"))
    val pairs = D.candidatePairs(docs, "doc_id", "toks", hashes = 12, bands = 2,
        minJaccard = 0.9, scopeCols = Seq("source"))
      .select($"id_a", $"id_b").localCheckpoint(true)
    val nEdges = pairs.count()
    val deg = pairs.select($"id_a".as("v")).unionByName(pairs.select($"id_b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("d"))
    // ONE action for node count + wedge sum (r20): deg was recomputed from
    // the checkpointed edge list twice — once for count(), once for the
    // wedge aggregate — for two numbers one hash-agg pass produces together.
    // Integer-exact: same count, same sum.
    val degStats = deg.agg(count(lit(1)).as("n"),
      sum($"d" * ($"d" - 1L) / lit(2L)).cast("long").as("w")).head
    val nNodes = degStats.getLong(0)
    val wedges = degStats.getLong(1)
    val tri = pairs.as("e1")
      .join(pairs.as("e2"), $"e1.id_b" === $"e2.id_a")
      .join(pairs.as("e3"),
        $"e3.id_a" === $"e1.id_a" && $"e3.id_b" === $"e2.id_b")
      .count()
    Seq((nNodes, nEdges, tri,
      BigDecimal(if (wedges == 0) 0.0 else 3.0 * tri / wedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_nodes", "n_edges", "n_triangles", "transitivity")
  }

  val q141_oracle: String =
    s"""WITH $lshPairsCtes,
       |p AS ($lshPairsSelect),
       |deg AS (SELECT v, count(*)::BIGINT AS d FROM (
       |    SELECT doc_a AS v FROM p UNION ALL SELECT doc_b FROM p) GROUP BY 1),
       |w AS (SELECT sum(d * (d - 1) / 2)::BIGINT AS wedges FROM deg),
       |tri AS (SELECT count(*)::BIGINT AS t FROM p e1
       |  JOIN p e2 ON e1.doc_b = e2.doc_a
       |  JOIN p e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
       |SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
       |  (SELECT count(*) FROM p)::BIGINT AS n_edges,
       |  (SELECT t FROM tri) AS n_triangles,
       |  round(CASE WHEN (SELECT wedges FROM w) = 0 THEN 0.0::DOUBLE
       |    ELSE 3.0::DOUBLE * (SELECT t FROM tri) / (SELECT wedges FROM w)
       |    END, 6) AS transitivity
       |FROM (SELECT 1)""".stripMargin

  // ------------------------------------------------ q93 near-containment
  /** Asymmetric near-dup: containment(A in B) = |A∩B|/|A| in BOTH directions
    * over the same source-scoped LSH candidates as q36 — catches "small doc
    * is mostly inside big doc" pairs whose symmetric Jaccard stays under any
    * dedup threshold (DedupFunctions.containmentPairs; the q36 ↔ q93 pair on
    * one candidate set is the full asymmetric/symmetric dedup toolkit).
    */
  val q93_containment: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", $"source", T.tokenSet($"text").as("toks"))
    D.containmentPairs(docs, "doc_id", "toks", hashes = 12, bands = 2,
        minContainment = 0.5, scopeCols = Seq("source"))
      .select($"id_a".as("doc_a"), $"id_b".as("doc_b"),
        round($"cont_a_in_b", 6).as("cont_a_in_b"),
        round($"cont_b_in_a", 6).as("cont_b_in_a"))
  }

  val q93_oracle: String =
    s"""WITH $lshPairsCtes
       |SELECT doc_a, doc_b,
       |  round(len(list_intersect(hs_a, hs_b))::DOUBLE / len(list_distinct(hs_a)), 6)
       |    AS cont_a_in_b,
       |  round(len(list_intersect(hs_a, hs_b))::DOUBLE / len(list_distinct(hs_b)), 6)
       |    AS cont_b_in_a
       |FROM cand
       |WHERE greatest(
       |    len(list_intersect(hs_a, hs_b))::DOUBLE / len(list_distinct(hs_a)),
       |    len(list_intersect(hs_a, hs_b))::DOUBLE / len(list_distinct(hs_b))) >= 0.5""".stripMargin

  // ----------------------------------------------------------- q37 simhash
  /** SimHash near-dup: 16-bit signature per doc; pairs of consecutive doc_ids
    * compared by Hamming distance (linear, deterministic probe of the simhash
    * machinery — full pairwise search would use LSH on signature bytes).
    */
  val q37_dedup_simhash: Q = (s, dir) => {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .select($"doc_id", D.tokenHashes(T.tokenSet($"text")).as("hs"))
      .select($"doc_id", D.simhashFromHashes($"hs", bits = 16).as("simhash"))
      .cache() // consumed twice by the consecutive-id self-join
    val nxt = sh.select(($"doc_id" - 1).as("doc_id"), $"simhash".as("next_simhash"))
    val out = sh.join(nxt, Seq("doc_id"))
      .select($"doc_id", $"simhash",
        D.hammingDistance($"simhash", $"next_simhash").as("hamming_to_next"))
      .cache()
    out.count() // materialize the small result, then release the per-doc cache
    sh.unpersist()
    out
  }

  val q37_oracle: String = {
    val votes = (0 until 16).map { b =>
      s"""(CASE WHEN list_sum(list_transform(hs, h ->
         |  CASE WHEN strpos('13579bdf', h[${b + 1}]) > 0 THEN 1 ELSE -1 END)) > 0
         |  THEN ${1L << b} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, list_distinct($tokSql) AS ts FROM documents),
       |hashed AS (SELECT doc_id, list_transform(ts, t -> md5('sh:' || t)) AS hs FROM toks),
       |sh AS (SELECT doc_id, ($votes)::BIGINT AS simhash FROM hashed)
       |SELECT a.doc_id, a.simhash, bit_count(xor(a.simhash, b.simhash))::INT AS hamming_to_next
       |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin
  }

  // ------------------------------------------------- q38 ngram jaccard pairs
  /** n-gram (3-shingle) Jaccard between consecutive docs — exercises the shingle
    * extraction + set-similarity path used for fuzzy dedup at k>1 granularity.
    */
  val q38_ngram_jaccard: Q = (s, dir) => {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .withColumn("th", T.tokenLongHashes($"text")) // one md5 pass per doc
      .select($"doc_id", T.shingleHashesFrom($"th", 3).as("sh"))
      .cache() // consumed twice by the consecutive-id self-join
    val nxt = sh.select(($"doc_id" - 1).as("doc_id"), $"sh".as("sh_next"))
    val out = sh.join(nxt, Seq("doc_id"))
      .select($"doc_id", D.jaccard($"sh", $"sh_next").as("trigram_jaccard"))
      .cache()
    out.count() // materialize the small result, then release the per-doc cache
    sh.unpersist()
    out
  }

  val q38_oracle: String =
    s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |th AS (SELECT doc_id,
       |  list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
       |  FROM toks),
       |sh AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(h) >= 3
       |    THEN list_transform(range(1, len(h) - 1), i -> h[i] * 4099 + h[i+1] * 31 + h[i+2])
       |    ELSE [] END) AS s
       |  FROM th)
       |SELECT a.doc_id,
       |  CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
       |    THEN len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s)))
       |    ELSE 0.0 END AS trigram_jaccard
       |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1""".stripMargin

  // ---------------------------------------------- q47 near-dup clustering
  /** Near-dup clusters: connected components over the MinHash-LSH pair graph
    * (q36's pairs) — the "keep one canonical doc per duplicate cluster" op of
    * an LLM training pipeline. Component id = min doc id in the cluster
    * (min-label propagation + pointer jumping, O(log diameter) shuffles —
    * DedupFunctions.connectedComponents); output is one row per cluster.
    */
  val q47_dedup_clusters: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", $"source", T.tokenSet($"text").as("toks"))
    val pairs = D.candidatePairs(docs, "doc_id", "toks",
      hashes = 12, bands = 2, minJaccard = 0.9, scopeCols = Seq("source"))
    D.connectedComponents(pairs, "id_a", "id_b")
      .groupBy($"label".as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"))
  }

  val q47_oracle: String =
    s"""WITH RECURSIVE $lshPairsCtes,
       |pairs AS ($lshPairsSelect),
       |nodes AS (SELECT DISTINCT doc_a AS id FROM pairs UNION SELECT doc_b FROM pairs),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
       |labels AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT cluster_id, count(*) AS n_docs FROM labels GROUP BY cluster_id""".stripMargin

  // ------------------------------------- q48 training-corpus preparation
  /** The composite LLM-pipeline op: quality-filter (≥ 0.5) then exact dedup
    * keeping the lowest doc_id per fingerprint, reporting per-source corpus
    * stats. One quality/fingerprint projection, one window over the
    * fingerprint, one final agg — three shuffles total at any scale.
    */
  val q48_training_corpus: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"fp").orderBy($"doc_id")
    // One-pass projection: tokenize ONCE (the regex split is the per-row cost),
    // derive quality + fingerprint from the shared `ts` column, and drop `text`
    // before the fingerprint window so neither shuffle carries the payload.
    // (Two nested selects on purpose: CollapseProject keeps the non-cheap `ts`
    // from being inlined three times.)
    t(s, dir, "documents")
      .select($"doc_id", $"source", $"text", T.tokens($"text").as("ts"))
      .select($"doc_id", $"source",
        T.qualityScoreFrom($"ts", $"text", enStop).as("quality"),
        T.exactFingerprintFrom($"ts").as("fp"),
        T.wsTokenCount($"text").as("n_tokens"))
      .filter($"quality" >= 0.5)
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs_kept"),
        sum($"n_tokens").as("tokens_kept"),
        round(avg($"quality"), 6).as("avg_quality"))
  }

  val q48_oracle: String = {
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    $qualityExprSql AS quality,
       |    md5(array_to_string(ts, ' ')) AS fp,
       |    len(list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'), x -> x <> '')) AS n_tokens
       |  FROM (SELECT doc_id, source, text, $tokSql AS ts FROM documents)),
       |kept AS (
       |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
       |  FROM scored WHERE quality >= 0.5)
       |SELECT source, count(*) AS n_docs_kept, sum(n_tokens)::BIGINT AS tokens_kept,
       |  round(avg(quality), 6) AS avg_quality
       |FROM kept WHERE rk = 1 GROUP BY source""".stripMargin
  }

  // --------------------------------------- q49 deterministic stratified sample
  /** Hash-based stratified sampling — the reproducible downsampling primitive
    * of a training pipeline: keep ~20% per source, membership decided by a
    * content-independent md5 of the doc id, so the same doc is kept in every
    * run on every engine (unlike `sample()`'s RNG, which no oracle can
    * replay). Row-local: no shuffle until the report agg.
    */
  val q49_stratified_sample: Q = (s, dir) => {
    import s.implicits._
    val slot = pmod(
      T.md5PrefixLong(concat(lit("smp:"), $"doc_id".cast("string"))), lit(100L))
    t(s, dir, "documents")
      .filter(slot < 20)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"), sum(length($"text")).as("chars_sampled"))
  }

  val q49_oracle: String =
    """SELECT source, count(*) AS n_sampled, sum(length(text))::BIGINT AS chars_sampled
      |FROM documents
      |WHERE ('0x' || substr(md5('smp:' || doc_id::VARCHAR), 1, 8))::BIGINT % 100 < 20
      |GROUP BY source""".stripMargin

  // ---------------------------------------------------------- q29 tf-idf
  /** The second canonical Jet example (reference: examples/tf-idf): inverted
    * index with tf-idf weights, here reported as each document's top term.
    * Two shuffles: term-frequency agg on (doc, term), document-frequency agg
    * on term (broadcast back — the term dictionary is small relative to the
    * corpus at any scale).
    */
  val q29_tfidf: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
    val nDocs = docs.count() // tiny scalar, computed once
    // explode_outer + null filter: keeps the tokenizer out of a
    // generate-inferred pushed filter (see q30)
    val tf = docs.select($"doc_id", explode_outer(T.tokens($"text")).as("term"))
      .filter($"term".isNotNull)
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    // rank on the ROUNDED weight: mathematically-tied tfidf values (e.g.
    // 2·ln(4) vs ln(16)) land on different last-ulp sides per engine, which
    // would flip the winner; rounding makes the term tie-break decide both
    // sides identically
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term".asc)
    tf.join(broadcast(df_), "term")
      .withColumn("tfidf", round($"tf" * log(lit(nDocs.toDouble) / $"df"), 6))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"doc_id", $"term".as("top_term"), $"tfidf".as("top_tfidf"))
  }

  val q29_oracle: String =
    s"""WITH tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($tokSql) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n_docs / df.df), 6) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
       |  FROM scored)
       |SELECT doc_id, term AS top_term, tfidf AS top_tfidf FROM ranked WHERE rk = 1""".stripMargin

  // ------------------------------------------------------------- registry
  // --------------------------------------------- q68 benchmark decontamination
  /** Training-set decontamination (public recipe: the GPT-3/Llama-paper n-gram
    * overlap scrub): flag every training document sharing at least one word
    * n-gram with a held-out benchmark set. 100 TB shape: the benchmark
    * shingle set is tiny (benchmarks are small by nature) → BROADCAST
    * semi-join against it; the corpus is scanned once, exploded shingles
    * never shuffle. Same md5 token hashes as q38, so the DuckDB oracle
    * replays the overlap exactly.
    */
  val q68_decontaminate: Q = (s, dir) => {
    import s.implicits._
    val sh = t(s, dir, "documents")
      .withColumn("th", T.tokenLongHashes($"text"))
      .select($"doc_id", T.shingleHashesFrom($"th", 3).as("sh"))
    // explode_outer everywhere here, not explode: InferFiltersFromGenerate +
    // predicate pushdown would inline the whole shingle expression (with th's
    // md5-of-every-token transform repeated per element_at reference) into a
    // below-Project filter — measured 100 s instead of ~2 s at sf0.1, O(tokens²)
    // md5 work per doc. The outer generate infers no filter; the explicit
    // isNotNull on the GENERATED column stays above the Generate.
    // held-out "benchmark": every 20th doc (stand-in for an eval-set table)
    val benchShingles = sh.filter($"doc_id" % 20 === 0)
      .select(explode_outer($"sh").as("h"))
      .filter($"h".isNotNull).distinct()
    sh.filter($"doc_id" % 20 =!= 0)
      .select($"doc_id", explode_outer($"sh").as("h"))
      .filter($"h".isNotNull)
      .join(broadcast(benchShingles), Seq("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  val q68_oracle: String =
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
       |train AS (SELECT doc_id, unnest(s) AS h FROM sh WHERE doc_id % 20 <> 0)
       |SELECT t.doc_id, count(*) AS n_overlap
       |FROM train t JOIN bench b ON t.h = b.h
       |GROUP BY t.doc_id""".stripMargin

  // --------------------------------------------------------- q69 PII redaction
  /** PII scrub pass (TextFunctions.redactPii): emails/phones/IPv4 → typed
    * placeholders. The fixture has no PII-shaped columns, so the text under
    * test is assembled deterministically from c_custkey (same construction on
    * both sides) — the hash compare then proves the full redacted strings
    * match byte-for-byte. Row-local regex chain, no shuffle.
    */
  val q69_redact_pii: Q = (s, dir) => {
    import s.implicits._
    val pii = concat_ws(" ", $"c_name",
      concat(lit("32-"), lpad(($"c_custkey" % 1000).cast("string"), 3, "0"),
        lit("-555-"), lpad(($"c_custkey" % 10000).cast("string"), 4, "0")),
      concat(lit("user"), $"c_custkey".cast("string"), lit("@example.com")),
      concat(lit("10."), ($"c_custkey" % 200).cast("string"), lit(".0.1")))
    t(s, dir, "customer")
      .select($"c_custkey", pii.as("raw"), T.redactPii(pii).as("redacted"))
  }

  val q69_oracle: String =
    """WITH raw AS (
      |  SELECT c_custkey,
      |    c_name || ' 32-' || lpad((c_custkey % 1000)::VARCHAR, 3, '0') || '-555-' ||
      |    lpad((c_custkey % 10000)::VARCHAR, 4, '0') || ' user' || c_custkey::VARCHAR ||
      |    '@example.com 10.' || (c_custkey % 200)::VARCHAR || '.0.1' AS raw
      |  FROM customer)
      |SELECT c_custkey, raw,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g'),
      |    '\([0-9]{3}\)\s?[0-9]{3}[-.][0-9]{4}', '[PHONE]', 'g'),
      |    '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '[PHONE]', 'g'),
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS redacted
      |FROM raw""".stripMargin

  // ------------------------------------------------ q70 repetition detection
  /** Within-document repetition ratio (Gopher-style quality rule, public
    * recipe): fraction of word trigrams that are duplicates of an earlier
    * trigram in the same document. Pure row-local arithmetic over the shared
    * md5 token hashes — no shuffle, linear scan at any corpus size.
    */
  val q70_repetition: Q = (s, dir) => {
    import s.implicits._
    // materialize the md5 hash array ONCE per row: passed as a raw expression,
    // every one of shingleHashesFrom's ~5 internal references would inline a
    // full per-token md5 pass (measured 58 s vs ~1 s at sf0.1). The nested
    // select keeps CollapseProject from re-inlining the non-cheap projection.
    val total = greatest(size($"th") - 2, lit(0))
    val distinct = size(T.shingleHashesFrom($"th", 3))
    t(s, dir, "documents")
      .select($"doc_id", T.tokenLongHashes($"text").as("th"))
      .select(
        $"doc_id", total.as("n_trigrams"),
        when(total > 0,
          round(lit(1.0) - distinct.cast("double") / total.cast("double"), 4))
          .otherwise(lit(0.0)).as("rep_ratio"))
  }

  val q70_oracle: String =
    s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |th AS (SELECT doc_id,
       |  list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
       |  FROM toks)
       |SELECT doc_id,
       |  greatest(len(h) - 2, 0) AS n_trigrams,
       |  CASE WHEN len(h) >= 3 THEN round(1.0 - len(list_distinct(
       |    list_transform(range(1, len(h) - 1), i -> h[i] * 4099 + h[i+1] * 31 + h[i+2])
       |  ))::DOUBLE / (len(h) - 2), 4) ELSE 0.0 END AS rep_ratio
       |FROM th""".stripMargin

  // ------------------------------------------- q71 domain mixing weights
  /** Per-source sampling weights for corpus mixing (the "data mixture" step of
    * training-set assembly, public recipe): weight each source so all sources
    * contribute equal tokens when sampled. One hash-agg over the corpus; the
    * tiny per-source table then joins/broadcasts wherever sampling happens.
    */
  val q71_mix_weights: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val perSource = t(s, dir, "documents")
      .groupBy($"source")
      .agg(sum(size(T.tokens($"text")).cast("long")).as("src_tokens"))
    val all = Window.partitionBy()
    perSource.select($"source", $"src_tokens",
      round(sum($"src_tokens").over(all).cast("double") /
        (count(lit(1)).over(all) * $"src_tokens"), 6).as("weight"))
  }

  val q71_oracle: String =
    s"""WITH s AS (
       |  SELECT source, sum(len($tokSql))::BIGINT AS src_tokens
       |  FROM documents GROUP BY source)
       |SELECT source, src_tokens,
       |  round((SELECT sum(src_tokens) FROM s)::DOUBLE /
       |        ((SELECT count(*) FROM s) * src_tokens), 6) AS weight
       |FROM s""".stripMargin

  // ------------------------------------------------ q72 sequence packing
  /** Sequence packing (the last step of LLM training-batch prep, public
    * recipe: concatenate documents in order, chunk at a fixed context
    * length). pack_id = which context window a doc's FIRST token lands in
    * under per-source in-order concatenation; output = per-pack document and
    * token counts (the pack manifest a loader would read). One window
    * shuffle partitioned by source + one hash-agg — the running sum never
    * leaves its source partition, so the op scales with sources × docs; if
    * one source dominates at 100 TB, salt it into sub-sources first (the
    * packing is order-preserving within each salt).
    */
  val q72_pack_sequences: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ctxLen = 2048
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select($"doc_id", $"source", T.wsTokenCount($"text").cast("long").as("n_tokens"))
      .withColumn("start_tok", sum($"n_tokens").over(w) - $"n_tokens")
      .withColumn("pack_id", floor($"start_tok" / ctxLen).cast("long"))
      .groupBy($"source", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("pack_tokens"))
  }

  val q72_oracle: String =
    s"""WITH toks AS (SELECT doc_id, source,
       |  len(list_filter(string_split_regex(text, '[ \\t\\n\\f\\r]+'), x -> x <> ''))::BIGINT AS n_tokens
       |  FROM documents),
       |cum AS (SELECT source, n_tokens,
       |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_tok
       |  FROM toks)
       |SELECT source, floor(start_tok / 2048)::BIGINT AS pack_id,
       |  count(*) AS n_docs, sum(n_tokens)::BIGINT AS pack_tokens
       |FROM cum GROUP BY source, pack_id""".stripMargin

  // --------------------------------------------- q73 dedup keep-best copy
  /** Dedup with a KEEP-BEST policy (public pipeline recipe: when several
    * near-copies of a document exist, keep the highest-QUALITY copy, not the
    * first-seen one — q48 keeps min doc_id). The group key is a PREFIX
    * fingerprint (md5 of the first 5 tokens — the "same-lede" heuristic used
    * for boilerplate/mirror collapse). Ranking is on the ROUNDED quality: the
    * keep/drop decision is binary and must not hinge on last-ulp float
    * differences between engines; ties break on doc_id. Output = the kept
    * copy of every collided fingerprint plus how many copies it beat. Same
    * tokenize-once / drop-text-before-shuffle shape as q48: three shuffles
    * at any scale.
    */
  val q73_dedup_keep_best: Q = (s, dir) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"fp").orderBy($"quality".desc, $"doc_id".asc)
    val wc = Window.partitionBy($"fp")
    t(s, dir, "documents")
      .select($"doc_id", $"source", $"text", T.tokens($"text").as("ts"))
      .select($"doc_id", $"source",
        round(T.qualityScoreFrom($"ts", $"text", enStop), 6).as("quality"),
        md5(concat_ws(" ", slice($"ts", 1, 5))).as("fp"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(wc))
      .filter($"rk" === 1 && $"n_copies" > 1)
      .select($"doc_id", $"source", $"quality", $"n_copies")
  }

  val q73_oracle: String =
    s"""WITH scored AS (
       |  SELECT doc_id, source, round($qualityExprSql, 6) AS quality,
       |    md5(array_to_string(ts[1:5], ' ')) AS fp
       |  FROM (SELECT doc_id, source, text, $tokSql AS ts FROM documents)),
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY fp ORDER BY quality DESC, doc_id ASC) AS rk,
       |    count(*) OVER (PARTITION BY fp) AS n_copies
       |  FROM scored)
       |SELECT doc_id, source, quality, n_copies
       |FROM ranked WHERE rk = 1 AND n_copies > 1""".stripMargin

  // ------------------------------------- q78 cross-doc boilerplate n-grams
  /** Corpus-level boilerplate detection (the MassiveText/RefinedWeb recipe:
    * n-grams shared by many documents are template/boilerplate text, and a
    * document dominated by them is low-value): per-doc fraction of distinct
    * word-trigrams whose DOCUMENT frequency is ≥1% of the corpus. Distinct
    * from q70 (within-doc repetition) and q68 (overlap vs a held-out set) —
    * this one's signal is cross-document.
    * Scale shape: one tokenize pass, explode to (doc, trigram-hash) longs,
    * one count shuffle keyed on the hash, one semi-join back, one per-doc
    * count — all linear; the hot set is tiny by construction (it's the ≥1%
    * tail) so AQE broadcasts the semi-join at any corpus size.
    */
  val q78_boilerplate: Q = (s, dir) => {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val thresh = math.ceil(0.01 * docs.count()).toLong
    // two-level select: materialize the md5 token hashes once per row (the
    // q70 generate-inlining lesson) before the multi-reference shingle expr
    val sh = Tables.fanOutScan(docs)
      .select($"doc_id", T.tokenLongHashes($"text").as("th"))
      .select($"doc_id", T.shingleHashesFrom($"th", 3).as("sh"))
    val ex = sh.select($"doc_id", explode_outer($"sh").as("h"))
      .filter($"h".isNotNull)
    val hot = ex.groupBy($"h").agg(count(lit(1)).as("nd"))
      .filter($"nd" >= thresh).select($"h")
    val nb = ex.join(hot, Seq("h"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_boiler"))
    sh.select($"doc_id", size($"sh").cast("long").as("n_shingles"))
      .join(nb, Seq("doc_id"), "left")
      .select($"doc_id", $"n_shingles",
        coalesce($"n_boiler", lit(0L)).as("n_boiler"),
        round(coalesce($"n_boiler", lit(0L)).cast("double") /
          when($"n_shingles" > 0, $"n_shingles"), 6).as("boiler_frac"))
  }

  val q78_oracle: String =
    s"""WITH toks AS (SELECT doc_id, $tokSql AS t FROM documents),
       |th AS (SELECT doc_id,
       |  list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
       |  FROM toks),
       |sh AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(h) >= 3
       |    THEN list_transform(range(1, len(h) - 1), i -> h[i] * 4099 + h[i+1] * 31 + h[i+2])
       |    ELSE [] END) AS s
       |  FROM th),
       |ex AS (SELECT doc_id, unnest(s) AS h FROM sh),
       |hot AS (SELECT h FROM (SELECT h, count(*) AS nd FROM ex GROUP BY h)
       |  WHERE nd >= (SELECT ceil(0.01 * count(*)) FROM documents)),
       |nb AS (SELECT doc_id, count(*) AS n_boiler FROM ex JOIN hot USING (h)
       |  GROUP BY doc_id)
       |SELECT sh.doc_id, len(sh.s) AS n_shingles,
       |  coalesce(nb.n_boiler, 0) AS n_boiler,
       |  round(coalesce(nb.n_boiler, 0)::DOUBLE / nullif(len(sh.s), 0), 6) AS boiler_frac
       |FROM sh LEFT JOIN nb ON sh.doc_id = nb.doc_id""".stripMargin

  // --------------------------------------- q79 repeated-passage spans (ExactSubstr)
  /** Verbatim repeated-passage detection — the W-gram relaxation of the
    * suffix-array ExactSubstr dedup from "Deduplicating Training Data Makes
    * Language Models Better" (Lee et al., 2022): any window of W consecutive
    * tokens that occurs ≥2 times anywhere in the corpus (other docs OR the
    * same doc) is a duplicated passage; overlapping duplicated windows merge
    * into maximal spans, the unit a dedup pass would actually cut. Distinct
    * from q78 (distinct-shingle document frequency → boilerplate fraction):
    * this is positional, multiplicity-counting, and emits mergeable spans.
    *
    * Scale shape: one tokenize pass (text dropped immediately), windows are
    * linear in token count (positional transform over the hash array — the
    * suffix array of the paper is replaced by a hash-groupBy, which is the
    * shuffle-native equivalent), one count shuffle keyed on the window hash,
    * one semi-join back (the duplicated-hash set is small → AQE broadcasts),
    * one per-doc sort window for the island merge. No all-pairs anywhere.
    * Window hash = positional polynomial over 32-bit token hashes with
    * coefficients < 2^20, so every term < 2^52 and the 8-term sum < 2^56 —
    * exact in both engines' BIGINT, no overflow wrap to diverge on.
    */
  val q79_repeated_spans: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val W = 8
    val coef = Seq(1L, 31L, 131L, 4099L, 16381L, 65537L, 262139L, 524287L)
    // two-level select: materialize token hashes before the window transform
    // references them W times (the q70 generate-inlining lesson)
    val th = Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", T.tokenLongHashes($"text").as("h"))
      .filter(size($"h") >= W)
    val wins = th.select($"doc_id",
      transform(sequence(lit(0), size($"h") - W),
        i => coef.zipWithIndex.map { case (c, j) =>
          element_at($"h", i + j + 1) * c
        }.reduce(_ + _)).as("ws"))
    // _outer + null filter, NOT plain posexplode: InferFiltersFromGenerate
    // would push an inferred size/notNull filter with the whole window-hash
    // transform INLINED below the Project (the q68/q70 pathology); the rule
    // skips outer generates, and the null filter on the generated column
    // restores plain-explode semantics without touching the generator input
    val ex = wins
      .select($"doc_id", posexplode_outer($"ws").as(Seq("pos", "wh")))
      .filter($"wh".isNotNull)
    val dup = ex.groupBy($"wh").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2).select($"wh")
    val dp = ex.join(dup, Seq("wh"), "left_semi")
    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    val brk = when($"pos" - lag($"pos", 1).over(byDoc) <= W, lit(0L))
      .otherwise(lit(1L))
    dp.withColumn("g", sum(brk).over(byDoc))
      .groupBy($"doc_id", $"g")
      .agg(min($"pos").cast("long").as("span_start"),
        (max($"pos") + W).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("g")
  }

  val q79_oracle: String = {
    val W = 8
    val coef = Seq(1L, 31L, 131L, 4099L, 16381L, 65537L, 262139L, 524287L)
    val poly = coef.zipWithIndex
      .map { case (c, j) => s"h[i+$j]*$c" }.mkString(" + ")
    s"""WITH th AS (SELECT doc_id,
       |  list_transform($tokSql, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h
       |  FROM documents),
       |wh AS (SELECT doc_id, i - 1 AS pos, $poly AS wh
       |  FROM th, LATERAL (SELECT unnest(range(1, len(h) - $W + 2)) AS i)
       |  WHERE len(h) >= $W),
       |dup AS (SELECT wh FROM wh GROUP BY wh HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM wh JOIN dup USING (wh)),
       |isl AS (SELECT doc_id, pos,
       |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $W
       |    THEN 0 ELSE 1 END AS brk FROM dp),
       |grp AS (SELECT doc_id, pos,
       |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM isl)
       |SELECT doc_id, min(pos) AS span_start, max(pos) + $W AS span_end,
       |  count(*) AS n_windows
       |FROM grp GROUP BY doc_id, g""".stripMargin
  }

  // ------------------------------------ q107 repeated-span EXCISION
  /** Contamination/boilerplate REMOVAL, not just detection: q79's repeated
    * spans (ExactSubstr W-gram islands) are cut OUT of every document —
    * tokens whose position falls inside any span are dropped and the cleaned
    * text re-joined. This is the destructive half of the ExactSubstr dedup
    * recipe (detect q79 / excise here): the trainer receives the corpus with
    * cross-document duplicated passages removed, per-doc stats witnessing
    * what was cut.
    *
    * Scale shape: spans per doc collapse to ONE array row (they are islands —
    * few per doc by construction), so the excision join is doc-keyed with a
    * tiny right side, and the token filter is row-local (O(tokens × spans)
    * with spans small). Text crosses no exchange: the spans do.
    */
  val q107_span_excision: Q = (s, dir) => {
    import s.implicits._
    val spans = q79_repeated_spans(s, dir)
      .groupBy($"doc_id")
      .agg(collect_list(struct($"span_start".as("s"), $"span_end".as("e"))).as("spans"))
    Tables.fanOutScan(t(s, dir, "documents"))
      .select($"doc_id", T.tokens($"text").as("toks"))
      .join(spans, Seq("doc_id"), "left")
      // docs with no spans carry a NULL array: exists → NULL, coalesce keeps
      .withColumn("kept", filter($"toks", (_, i) =>
        !coalesce(
          exists($"spans", sp => i >= sp.getField("s") && i < sp.getField("e")),
          lit(false))))
      .select($"doc_id", size($"toks").cast("long").as("n_tokens"),
        (size($"toks") - size($"kept")).cast("long").as("n_removed"),
        concat_ws(" ", $"kept").as("clean_text"))
  }

  val q107_oracle: String = {
    val W = 8
    val coef = Seq(1L, 31L, 131L, 4099L, 16381L, 65537L, 262139L, 524287L)
    val poly = coef.zipWithIndex
      .map { case (c, j) => s"h[i+$j]*$c" }.mkString(" + ")
    // q79's span CTE chain + excision: DuckDB lambdas index from 1 (hence
    // i-1); array_to_string of an empty list is NULL there where Spark's
    // concat_ws gives '' — coalesced
    s"""WITH th AS (SELECT doc_id,
       |  list_transform($tokSql, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h,
       |  $tokSql AS t
       |  FROM documents),
       |wh AS (SELECT doc_id, i - 1 AS pos, $poly AS wh
       |  FROM th, LATERAL (SELECT unnest(range(1, len(h) - $W + 2)) AS i)
       |  WHERE len(h) >= $W),
       |dup AS (SELECT wh FROM wh GROUP BY wh HAVING count(*) >= 2),
       |dp AS (SELECT doc_id, pos FROM wh JOIN dup USING (wh)),
       |isl AS (SELECT doc_id, pos,
       |  CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $W
       |    THEN 0 ELSE 1 END AS brk FROM dp),
       |grp AS (SELECT doc_id, pos,
       |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g FROM isl),
       |spans AS (SELECT doc_id, min(pos) AS s, max(pos) + $W AS e
       |  FROM grp GROUP BY doc_id, g),
       |sp AS (SELECT doc_id, list(s ORDER BY s) AS starts,
       |  list(e ORDER BY s) AS ends FROM spans GROUP BY doc_id),
       |base AS (SELECT th.doc_id, th.t,
       |  coalesce(sp.starts, []) AS starts, coalesce(sp.ends, []) AS ends
       |  FROM th LEFT JOIN sp ON th.doc_id = sp.doc_id),
       |kept AS (SELECT doc_id, t,
       |  list_filter(t, (x, i) ->
       |    len(list_filter(starts, (s0, j) -> i-1 >= s0 AND i-1 < ends[j])) = 0) AS k
       |  FROM base)
       |SELECT doc_id, len(t)::BIGINT AS n_tokens,
       |  (len(t) - len(k))::BIGINT AS n_removed,
       |  coalesce(array_to_string(k, ' '), '') AS clean_text
       |FROM kept""".stripMargin
  }

  // --------------------------------------------- q115 Gopher rule filter
  /** The published Gopher quality-rule battery (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", table A1 — the rule set most large-corpus
    * pipelines start from), one row-local pass, per-rule flags plus the
    * composite keep bit. Every comparison is INTEGER-exact (cross-multiplied
    * ratios, e.g. mean word length in [3,10] ⇔ 3n ≤ Σlen ≤ 10n) so no float
    * boundary can diverge between engines. Rules: word count in [50, 100k],
    * mean word length in [3, 10], symbol-to-word ratio (# and ellipsis)
    * ≤ 0.1, ≤ 90% bulleted lines, ≤ 30% ellipsis-ending lines, ≥ 80% words
    * with an alphabetic character, ≥ 2 distinct core stopwords. Zero
    * shuffles — the filter fuses into whatever scan feeds it.
    *
    * On the synthetic fixture the stopword rule fails corpus-wide (the
    * generator's token soup carries <2 core English stopwords per doc), so
    * `keep` is 0 everywhere while the other flags vary — per-rule flags are
    * the informative columns there; real prose passes r_stopwords routinely.
    */
  val q115_gopher_rules: Q = (s, dir) => {
    import s.implicits._
    val ws = filter(split($"text", "[ \\t\\n\\r]+"), w => length(w) > 0)
    val n = size(ws).cast("long")
    val totlen = aggregate(transform(ws, w => length(w).cast("long")), lit(0L), _ + _)
    val hashes = (length($"text") - length(replace($"text", lit("#"), lit("")))).cast("long")
    val ellipses = ((length($"text") -
      length(replace($"text", lit("..."), lit("")))) / 3).cast("long")
    val lines = filter(split($"text", "\n"), l => length(l) > 0)
    val nl = size(lines).cast("long")
    val bullets = size(filter(lines,
      l => substring(ltrim(l), 1, 1).isin("-", "*", "•"))).cast("long")
    val elines = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))).cast("long")
    val alphaW = size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(filter(array_distinct(transform(ws, w => lower(w))),
      w => w.isin("the", "be", "to", "of", "and", "that", "have", "with"))).cast("long")
    val flags: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "r_word_count" -> ((n >= 50) && (n <= 100000)),
      "r_mean_word_len" -> ((lit(3) * n <= totlen) && (totlen <= lit(10) * n)),
      "r_symbol_ratio" -> (lit(10) * (hashes + ellipses) <= n),
      "r_bullet_lines" -> (nl === 0 || lit(10) * bullets <= lit(9) * nl),
      "r_ellipsis_lines" -> (nl === 0 || lit(10) * elines <= lit(3) * nl),
      "r_alpha_words" -> (n > 0 && lit(5) * alphaW >= lit(4) * n),
      "r_stopwords" -> (stopHits >= 2))
    val named = flags.map { case (nm, f) => f.cast("int").as(nm) }
    val keep = flags.map(_._2.cast("int")).reduce(_ * _).as("keep")
    t(s, dir, "documents").select(($"doc_id" +: named :+ keep): _*)
  }

  val q115_oracle: String =
    s"""WITH w AS (SELECT doc_id, text,
       |  list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS ws,
       |  list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
       |  FROM documents),
       |m AS (SELECT doc_id,
       |  len(ws)::BIGINT AS n,
       |  list_sum(list_prepend(0, list_transform(ws, x -> length(x))))::BIGINT AS totlen,
       |  (length(text) - length(replace(text, '#', '')))::BIGINT AS hashes,
       |  ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS ellipses,
       |  len(lines)::BIGINT AS nl,
       |  len(list_filter(lines, l ->
       |    list_contains(['-','*','•'], substr(ltrim(l), 1, 1))))::BIGINT AS bullets,
       |  len(list_filter(lines, l ->
       |    ends_with(l, '...') OR ends_with(l, '…')))::BIGINT AS elines,
       |  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS alphaw,
       |  len(list_filter(list_distinct(list_transform(ws, x -> lower(x))),
       |    x -> list_contains(['the','be','to','of','and','that','have','with'], x)))::BIGINT
       |    AS stophits
       |  FROM w),
       |f AS (SELECT doc_id,
       |  (n >= 50 AND n <= 100000)::INT AS r_word_count,
       |  (3 * n <= totlen AND totlen <= 10 * n)::INT AS r_mean_word_len,
       |  (10 * (hashes + ellipses) <= n)::INT AS r_symbol_ratio,
       |  (nl = 0 OR 10 * bullets <= 9 * nl)::INT AS r_bullet_lines,
       |  (nl = 0 OR 10 * elines <= 3 * nl)::INT AS r_ellipsis_lines,
       |  (n > 0 AND 5 * alphaw >= 4 * n)::INT AS r_alpha_words,
       |  (stophits >= 2)::INT AS r_stopwords
       |  FROM m)
       |SELECT doc_id, r_word_count, r_mean_word_len, r_symbol_ratio,
       |  r_bullet_lines, r_ellipsis_lines, r_alpha_words, r_stopwords,
       |  (r_word_count * r_mean_word_len * r_symbol_ratio * r_bullet_lines
       |   * r_ellipsis_lines * r_alpha_words * r_stopwords) AS keep
       |FROM f""".stripMargin

  // ------------------------------------------- q121 PMI collocation mining
  /** Pointwise-mutual-information collocation mining: the phrase-vocabulary
    * induction step (word2vec's phrase pass, Mikolov et al. 2013, scores
    * adjacent pairs the same way) that decides which adjacent token pairs
    * become single vocabulary units before tokenizer training. p(a,b) from
    * bigram occurrences, p(a)/p(b) from unigram occurrences,
    * PMI = ln(p(a,b) / (p(a)p(b))), minimum support 5 so rare accidents
    * don't top the list. Top-25 by 6dp-rounded PMI (pair tie-break) with the
    * raw bigram count kept as an integer anchor in the output.
    *
    * 100 TB shape: bigrams come from a ROW-LOCAL transform over the token
    * array (no lag window, text never shuffles); unigram and bigram aggs are
    * vocabulary-bounded with map-side partials; corpus totals broadcast; the
    * result is a TakeOrdered over the support-filtered pair table.
    */
  val q121_pmi_collocations: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.fanOutScan(t(s, dir, "documents"))
      .select(T.tokens($"text").as("ws"))
      .filter(size($"ws") > 0)
    val uni = docs.select(explode($"ws").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c1"))
    val bi = docs.filter(size($"ws") >= 2)
      .select(explode(transform(sequence(lit(1), size($"ws") - 1),
        i => struct(element_at($"ws", i).as("a"), element_at($"ws", i + 1).as("b"))))
        .as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      .filter($"cab" >= 5)
    val totals = docs.agg(sum(size($"ws")).cast("double").as("n1"),
      sum(greatest(size($"ws") - 1, lit(0))).cast("double").as("nb"))
    bi.join(uni.select($"tok".as("a"), $"c1".as("ca")), "a")
      .join(uni.select($"tok".as("b"), $"c1".as("cb")), "b")
      .crossJoin(broadcast(totals))
      .select($"a", $"b", $"cab",
        round(log(($"cab".cast("double") / $"nb") /
          (($"ca".cast("double") / $"n1") * ($"cb".cast("double") / $"n1"))), 6)
          .as("pmi"))
      .orderBy($"pmi".desc, $"a".asc, $"b".asc)
      .limit(25)
  }

  val q121_oracle: String =
    s"""WITH tokl AS (SELECT ts FROM (SELECT $tokSql AS ts FROM documents)
       |  WHERE len(ts) > 0),
       |uni AS (SELECT t AS tok, count(*)::BIGINT AS c1
       |  FROM (SELECT unnest(ts) AS t FROM tokl) GROUP BY 1),
       |bi AS (SELECT ts[i] AS a, ts[i + 1] AS b, count(*)::BIGINT AS cab
       |  FROM tokl, unnest(generate_series(1, len(ts) - 1)) u(i)
       |  GROUP BY 1, 2 HAVING count(*) >= 5),
       |tot AS (SELECT sum(len(ts))::DOUBLE AS n1,
       |    sum(CASE WHEN len(ts) >= 2 THEN len(ts) - 1 ELSE 0 END)::DOUBLE AS nb
       |  FROM tokl)
       |SELECT a, b, cab,
       |  round(ln((cab::DOUBLE / nb) /
       |    ((ca.c1::DOUBLE / n1) * (cb.c1::DOUBLE / n1))), 6) AS pmi
       |FROM bi JOIN uni ca ON bi.a = ca.tok JOIN uni cb ON bi.b = cb.tok
       |CROSS JOIN tot
       |ORDER BY pmi DESC, a, b LIMIT 25""".stripMargin

  // ------------------------------------ q177 python-gRPC service transform
  /** The §2.4 python bridge carrying a gate (r14): document text routed
    * through a REAL python3 worker over the in-repo gRPC wire
    * ([[graft.pipeline.PythonGrpcTransforms]] — the reference's
    * JetToPythonServer topology: per-partition python gRPC server, one bidi
    * stream per batch). The handler answers `len:ntokens` per text; the
    * oracle recomputes both in DuckDB (code-point length; whitespace-run
    * token count over the EXPLICIT class `[ \t\n\f\r]+` — RE2's `\s` — which
    * the handler pins too: python's bare `str.split()` would additionally
    * split on \x0b/\x85/\xa0 and disagree with a correct engine result on
    * documents containing such characters), so the transport's 1:1 ORDERED
    * delivery is oracle-exact — a swapped or dropped response mispairs some
    * doc_id and hash-fails. Subset (doc_id % 20 = 0) keeps the python
    * round-trip bounded at big bench rungs.
    */
  val q177_python_grpc: Q = (s, dir) => {
    val handler = java.nio.file.Files.createTempFile("graft_q177_handler_", ".py")
    java.nio.file.Files.write(handler,
      """import re
        |def transform_list(items):
        |    return ["%d:%d" % (len(s),
        |                       len([t for t in re.split('[ \t\n\f\r]+', s) if t]))
        |            for s in items]
        |""".stripMargin.getBytes("UTF-8"))
    handler.toFile.deleteOnExit()
    val docs = t(s, dir, "documents")
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text"))
    graft.pipeline.PythonGrpcTransforms
      .mapUsingPythonGrpc(docs, "text", handler.toString)
      .select(col("doc_id"),
        split(col("text"), ":").getItem(0).cast("long").as("py_len"),
        split(col("text"), ":").getItem(1).cast("long").as("py_tokens"))
  }

  val q177_oracle: String =
    """SELECT doc_id, length(text)::BIGINT AS py_len,
      |  length(list_filter(string_split_regex(trim(text), '\s+'),
      |         x -> x <> ''))::BIGINT AS py_tokens
      |FROM documents WHERE doc_id % 20 = 0""".stripMargin

  val entries: Map[String, Q] = Map(
    "q177_python_grpc" -> q177_python_grpc,
    "q121_pmi_collocations" -> q121_pmi_collocations,
    "q130_dedup_pagerank" -> q130_dedup_pagerank,
    "q134_lsh_recall_audit" -> q134_lsh_recall_audit,
    "q141_dedup_graph_stats" -> q141_dedup_graph_stats,
    "q115_gopher_rules" -> q115_gopher_rules,
    "q107_span_excision" -> q107_span_excision,
    "q29_tfidf" -> q29_tfidf,
    "q30_wordcount" -> q30_wordcount,
    "q31_token_stats" -> q31_token_stats,
    "q32_quality_score" -> q32_quality_score,
    "q33_lang_id" -> q33_lang_id,
    "q34_fingerprint" -> q34_fingerprint,
    "q35_dedup_exact" -> q35_dedup_exact,
    "q36_dedup_minhash_lsh" -> q36_dedup_minhash_lsh,
    "q37_dedup_simhash" -> q37_dedup_simhash,
    "q38_ngram_jaccard" -> q38_ngram_jaccard,
    "q47_dedup_clusters" -> q47_dedup_clusters,
    "q48_training_corpus" -> q48_training_corpus,
    "q49_stratified_sample" -> q49_stratified_sample,
    "q68_decontaminate" -> q68_decontaminate,
    "q69_redact_pii" -> q69_redact_pii,
    "q70_repetition" -> q70_repetition,
    "q71_mix_weights" -> q71_mix_weights,
    "q72_pack_sequences" -> q72_pack_sequences,
    "q73_dedup_keep_best" -> q73_dedup_keep_best,
    "q78_boilerplate" -> q78_boilerplate,
    "q79_repeated_spans" -> q79_repeated_spans,
    "q93_containment" -> q93_containment)

  val oracles: Map[String, String] = Map(
    "q177_python_grpc" -> q177_oracle,
    "q121_pmi_collocations" -> q121_oracle,
    "q130_dedup_pagerank" -> q130_oracle,
    "q134_lsh_recall_audit" -> q134_oracle,
    "q141_dedup_graph_stats" -> q141_oracle,
    "q115_gopher_rules" -> q115_oracle,
    "q107_span_excision" -> q107_oracle,
    "q29_tfidf" -> q29_oracle,
    "q30_wordcount" -> q30_oracle,
    "q31_token_stats" -> q31_oracle,
    "q32_quality_score" -> q32_oracle,
    "q33_lang_id" -> q33_oracle,
    "q34_fingerprint" -> q34_oracle,
    "q35_dedup_exact" -> q35_oracle,
    "q36_dedup_minhash_lsh" -> q36_oracle,
    "q37_dedup_simhash" -> q37_oracle,
    "q38_ngram_jaccard" -> q38_oracle,
    "q47_dedup_clusters" -> q47_oracle,
    "q48_training_corpus" -> q48_oracle,
    "q49_stratified_sample" -> q49_oracle,
    "q68_decontaminate" -> q68_oracle,
    "q69_redact_pii" -> q69_oracle,
    "q70_repetition" -> q70_oracle,
    "q71_mix_weights" -> q71_oracle,
    "q72_pack_sequences" -> q72_oracle,
    "q73_dedup_keep_best" -> q73_oracle,
    "q78_boilerplate" -> q78_oracle,
    "q79_repeated_spans" -> q79_oracle,
    "q93_containment" -> q93_oracle)
}
