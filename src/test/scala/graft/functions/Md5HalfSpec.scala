package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftops.Bridge

/** The native md5-half token-hash expressions (expr.Md5Half /
  * expr.Md5HalfPairs) must be bit-identical to the composed
  * `conv(substring(md5(t), ...), 16, 10)` chains they replace — the chains
  * are what every DuckDB oracle replays (`('0x' || substr(md5(x),1,8))::
  * BIGINT`), so equality here is what keeps the whole LSH/minhash gate
  * family oracle-exact after the r19 hot-path swap.
  */
class Md5HalfSpec extends SparkSpec {

  import spark.implicits._

  private def foldHalf(c: org.apache.spark.sql.Column) =
    transform(c, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
  private def foldPairs(c: org.apache.spark.sql.Column) =
    transform(c, t => struct(
      conv(substring(md5(t), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(t), 9, 8), 16, 10).cast("long").as("h2")))
  private def nativeHalf(c: org.apache.spark.sql.Column) =
    Bridge.column(graft.functions.expr.Md5Half(Bridge.expression(c)))
  private def nativePairs(c: org.apache.spark.sql.Column) =
    Bridge.column(graft.functions.expr.Md5HalfPairs(Bridge.expression(c)))

  test("Md5Half / Md5HalfPairs == composed conv(md5) chains on fixture tokens") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(TextFunctions.tokenSet(col("text")).as("ts"))
    val rows = docs.select(
      nativeHalf($"ts").as("nh"), foldHalf($"ts").as("fh"),
      nativePairs($"ts").as("np"), foldPairs($"ts").as("fp")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      val np = r.getSeq[org.apache.spark.sql.Row](2)
      val fp = r.getSeq[org.apache.spark.sql.Row](3)
      assert(np.map(x => (x.getLong(0), x.getLong(1))) ===
        fp.map(x => (x.getLong(0), x.getLong(1))))
    }
  }

  test("unicode / mixed-byte tokens hash identically (digest is over UTF-8 bytes)") {
    val df = Seq(Seq("café", "中文", "a1", "", "x" * 300)).toDF("ts")
    val r = df.select(nativeHalf($"ts").as("n"), foldHalf($"ts").as("f")).collect().head
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
  }

  test("null contracts mirror the composed forms") {
    // null ARRAY -> null on both
    val nullArr = Seq(Option.empty[Seq[String]]).toDF("ts")
    assert(nullArr.select(nativeHalf($"ts")).collect().head.isNullAt(0))
    assert(nullArr.select(nativePairs($"ts")).collect().head.isNullAt(0))
    // null ELEMENT -> null long / struct(null, null), exactly like the folds
    val nullEl = Seq(Seq(Some("tok"), None)).toDF("ts")
    val nh = nullEl.select(nativeHalf($"ts")).collect().head.getSeq[Any](0)
    val fh = nullEl.select(foldHalf($"ts")).collect().head.getSeq[Any](0)
    assert(nh === fh)
    val np = nullEl.select(nativePairs($"ts")).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
    val fp = nullEl.select(foldPairs($"ts")).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(np.map(x => (x.isNullAt(0), x.isNullAt(1))) ===
      fp.map(x => (x.isNullAt(0), x.isNullAt(1))))
    assert(np.head.getLong(0) === fp.head.getLong(0))
  }

  private def foldPrefix(c: org.apache.spark.sql.Column, n: Int) =
    conv(substring(md5(c), 1, n), 16, 10).cast("long")
  private def nativePrefix(c: org.apache.spark.sql.Column, n: Int) =
    Bridge.column(graft.functions.expr.Md5PrefixLong(Bridge.expression(c), n))

  test("Md5PrefixLong == composed conv(md5) chain at 8 and 15 digits (r20 scalar sites)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("smp:"), col("doc_id").cast("string")).as("s"))
    val rows = docs.select(
      nativePrefix($"s", 8).as("n8"), foldPrefix($"s", 8).as("f8"),
      nativePrefix($"s", 15).as("n15"), foldPrefix($"s", 15).as("f15")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
    // unicode + empty + long strings, and the null contract
    val edge = Seq(Some("café"), Some("中文"), Some(""), Some("x" * 300), None)
      .toDF("s")
    val er = edge.select(nativePrefix($"s", 8).as("n"), foldPrefix($"s", 8).as("f"))
      .collect()
    er.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
  }

  test("Md5PrefixLong COMPILES inside whole-stage codegen (fallback disabled)") {
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").cast("string").as("s"))
      val df = docs.select(nativePrefix($"s", 8).as("h8"), nativePrefix($"s", 15).as("h15"))
      val rows = df.collect()
      assert(rows.nonEmpty)
      val fold = docs.select(foldPrefix($"s", 8), foldPrefix($"s", 15)).collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        fold.map(r => (r.getLong(0), r.getLong(1))).toSeq)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_md5prefix"), s"missing from plan:\n$plan")
      assert(plan.contains("*(1)"), s"not inside a codegen stage:\n$plan")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("native expressions COMPILE inside whole-stage codegen (fallback disabled)") {
    // a plan that PLANS a codegen stage can still fall back to interpreted
    // execution when Janino rejects the generated source (found at the 10×
    // rung: a `(Long)(<parenthesized>)` cast mis-parse) — disabling the
    // fallback turns a silent interpretation into a test failure
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(TextFunctions.tokenSet(col("text")).as("ts"))
      val df = docs.select(nativePairs($"ts").as("hp"), nativeHalf($"ts").as("h"))
      assert(df.collect().nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_md5halfpairs"), s"missing from plan:\n$plan")
      assert(plan.contains("graft_md5half"), s"missing from plan:\n$plan")
      assert(plan.contains("*(1)"), s"not inside a codegen stage:\n$plan")
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
