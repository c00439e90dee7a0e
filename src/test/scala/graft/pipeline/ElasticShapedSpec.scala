package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Elastic-shaped connector vs the in-process REST stub: bulk sink, sliced
  * scroll source (disjoint + complete), paging, scroll cleanup, 429 retry on
  * both directions. (Reference: extensions/elasticsearch/elasticsearch-7 —
  * ElasticSourceBuilder slicing/retries, ElasticSinkBuilder bulk/retries.)
  */
class ElasticShapedSpec extends SparkSpec {

  private def freshService(tag: String): (InMemoryElastic, String) =
    InMemoryElastic.create(s"es-$tag-${System.nanoTime()}")

  test("bulk sink indexes every row; source reads them back (unsliced)") {
    val (svc, ep) = freshService("roundtrip")
    try {
      import spark.implicits._
      val df = (1 to 257)
        .map(i => (s"d$i", s"""{"v":$i}"""))
        .toDF("id", "doc")
      ElasticShaped.SinkBuilder(ep, "docs", bulkSize = 50).write(df)
      assert(svc.docCount("docs") == 257)
      // bulkSize 50 → ceil(257/50)=6 bulk calls at parallelism 1... but the
      // frame has multiple partitions; just require at least the minimum
      assert(svc.bulkRequests.get() >= 6)

      val back = ElasticShaped.SourceBuilder(ep, "docs", pageSize = 40).build(spark)
      val vals = back
        .select(get_json_object($"doc", "$.v").cast("int").as("v"))
        .as[Int].collect().sorted
      assert(vals.toSeq == (1 to 257))
      assert(svc.activeScrolls == 0, "scroll contexts must be cleared after read")
    } finally svc.stop()
  }

  test("sliced scroll: slices are disjoint and complete, one partition per slice") {
    val (svc, ep) = freshService("sliced")
    try {
      (1 to 500).foreach(i => svc.indexDoc("big", s"doc-$i", s"""{"v":$i}"""))
      val src = ElasticShaped.SourceBuilder(ep, "big")
        .enableSlicing().withSlices(5).withPageSize(37)
        .build(spark)
      assert(src.rdd.getNumPartitions == 5)
      val perPartition = src.rdd
        .mapPartitionsWithIndex((idx, it) => Iterator((idx, it.size)))
        .collect().toMap
      assert(perPartition.values.sum == 500, "slices must cover every doc exactly once")
      assert(perPartition.values.count(_ > 0) >= 2, "multiple slices should carry docs")
      val ids = src.select("id").collect().map(_.getString(0)).toSet
      assert(ids.size == 500)
      assert(svc.activeScrolls == 0)
    } finally svc.stop()
  }

  test("sink retries 429 rejections with backoff; data lands exactly once") {
    val (svc, ep) = freshService("retry-sink")
    try {
      import spark.implicits._
      val df = (1 to 100).map(i => (s"r$i", s"""{"v":$i}""")).toDF("id", "doc")
        .repartition(1) // single bulk stream → deterministic fail-injection
      svc.failNextBulk.set(2)
      ElasticShaped.SinkBuilder(ep, "retried", bulkSize = 1000).write(df)
      assert(svc.docCount("retried") == 100)
      // 2 rejected + 1 success
      assert(svc.bulkRequests.get() == 3)
    } finally svc.stop()
  }

  test("source retries 429 on search; fails after budget exhausted") {
    val (svc, ep) = freshService("retry-src")
    try {
      (1 to 10).foreach(i => svc.indexDoc("idx", s"s$i", s"""{"v":$i}"""))
      svc.failNextSearch.set(2)
      val ok = ElasticShaped.SourceBuilder(ep, "idx", retries = 5).build(spark)
      assert(ok.count() == 10)

      svc.failNextSearch.set(10)
      val doomed = ElasticShaped.SourceBuilder(ep, "idx", retries = 1).build(spark)
      val e = intercept[org.apache.spark.SparkException](doomed.count())
      assert(e.getMessage.contains("429") ||
        Option(e.getCause).exists(_.getMessage.contains("429")))
    } finally svc.stop()
  }

  test("explicit ids make bulk writes idempotent (replay = upsert, no dupes)") {
    val (svc, ep) = freshService("idempotent")
    try {
      import spark.implicits._
      val df = (1 to 50).map(i => (s"k$i", s"""{"v":$i}""")).toDF("id", "doc")
      ElasticShaped.SinkBuilder(ep, "ups").write(df)
      ElasticShaped.SinkBuilder(ep, "ups").write(df) // full replay
      assert(svc.docCount("ups") == 50)
    } finally svc.stop()
  }

  test("source rows parse back through from_json into typed columns") {
    val (svc, ep) = freshService("typed")
    try {
      svc.indexDoc("t", "a", """{"name":"x","n":3}""")
      svc.indexDoc("t", "b", """{"name":"y","n":4}""")
      val df = ElasticShaped.SourceBuilder(ep, "t").build(spark)
      val typed = df.select(
        col("id"),
        from_json(col("doc"),
          org.apache.spark.sql.types.StructType.fromDDL("name STRING, n INT")).as("s"))
        .select("id", "s.name", "s.n")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(typed == Set(("a", "x", 3), ("b", "y", 4)))
    } finally svc.stop()
  }
}
