package graft.sql

import graft.SparkSpec
import graft.pipeline.KeyedStore

/** SQL-face tests: mapping DDL, SHOW statements, SINK INTO, job registry —
  * mirroring the reference SqlTestSupport suites (SURVEY §2.13, §5.3).
  */
class GraftSqlSpec extends SparkSpec {

  private lazy val sql = GraftSql(spark)

  test("CREATE MAPPING exposes a parquet file as a queryable table") {
    sql.execute(s"CREATE MAPPING li_map EXTERNAL NAME '$sf/lineitem.parquet' TYPE parquet")
    val n = sql.execute("SELECT count(*) AS n FROM li_map").collect().head.getLong(0)
    assert(n > 1000)
    assert(sql.execute("SHOW MAPPINGS").collect().map(_.getString(0)).contains("li_map"))
    sql.execute("DROP MAPPING li_map")
    assert(!sql.execute("SHOW MAPPINGS").collect().map(_.getString(0)).contains("li_map"))
  }

  test("proprietary value formats fail with the supported-format list") {
    // the reference's portable/compact/java formats are Hazelcast-internal
    // wire layouts with no public spec — a documented decision, not a gap
    for (fmt <- Seq("portable", "java", "compact")) {
      val e = intercept[IllegalArgumentException](sql.execute(
        s"CREATE MAPPING p_$fmt EXTERNAL NAME '$sf/orders.parquet' TYPE $fmt"))
      assert(e.getMessage.contains("proprietary") &&
        e.getMessage.contains("protobuf"),
        s"TYPE $fmt must name the supported formats: ${e.getMessage}")
    }
  }

  test("CREATE MAPPING with OPTIONS path") {
    sql.execute(s"CREATE OR REPLACE MAPPING ord TYPE parquet OPTIONS ('path' = '$sf/orders.parquet')")
    val n = sql.execute("SELECT count(*) AS n FROM ord").collect().head.getLong(0)
    assert(n > 100)
    sql.execute("DROP MAPPING ord")
  }

  test("CREATE MAPPING with a column list prunes and renames (csv, positional)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csvmap_").toString + "/data"
    Seq((1L, "ann", 10.5), (2L, "bob", 20.0)).toDF("id", "name", "score")
      .write.option("header", "true").csv(dir)
    // csv reads positionally: the declared list IS the scan schema
    sql.execute(
      s"""CREATE OR REPLACE MAPPING people EXTERNAL NAME '$dir' (
         |  id BIGINT, name VARCHAR, score DOUBLE
         |) TYPE csv""".stripMargin)
    val rows = sql.execute("SELECT id, name, score FROM people ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, "ann", 10.5), (2L, "bob", 20.0)))
    sql.execute("DROP MAPPING people")
  }

  test("CREATE MAPPING json with declared schema + per-column EXTERNAL NAME") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonmap_").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/d.json"),
      """{"user_id":7,"full_name":"carol"}""" + "\n")
    sql.execute(
      s"""CREATE OR REPLACE MAPPING users EXTERNAL NAME '$dir' (
         |  id BIGINT EXTERNAL NAME 'user_id',
         |  name VARCHAR EXTERNAL NAME 'full_name'
         |) TYPE json""".stripMargin)
    val r = sql.execute("SELECT id, name FROM users").collect().head
    assert((r.getLong(0), r.getString(1)) === ((7L, "carol")))
    // catalog surface: SHOW COLUMNS + information_schema.columns
    val cols = sql.execute("SHOW COLUMNS FROM users")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(cols.toSeq === Seq(("id", "BIGINT", "user_id"), ("name", "VARCHAR", "full_name")))
    val info = sql.execute(
      "SELECT column_name FROM information_schema.columns WHERE mapping_name = 'users' ORDER BY ordinal")
      .collect().map(_.getString(0))
    assert(info.toSeq === Seq("id", "name"))
    sql.execute("DROP MAPPING users")
  }

  test("plain SELECT delegates to Catalyst") {
    val out = sql.execute("SELECT 1 + 1 AS two").collect().head.getInt(0)
    assert(out === 2)
  }

  test("SINK INTO upserts into the KeyedStore (last-writer-wins)") {
    sql.execute(s"CREATE OR REPLACE MAPPING cust TYPE parquet OPTIONS ('path' = '$sf/customer.parquet')")
    sql.execute("SINK INTO cust_store(c_custkey) SELECT c_custkey, c_acctbal FROM cust")
    val n1 = KeyedStore.get(spark, "cust_store").count()
    // second sink with modified balances must not duplicate keys
    sql.execute("SINK INTO cust_store(c_custkey) SELECT c_custkey, c_acctbal * 2 AS c_acctbal FROM cust")
    val store = KeyedStore.get(spark, "cust_store")
    assert(store.count() === n1)
    sql.execute("DROP MAPPING cust")
    KeyedStore.drop("cust_store")
  }

  test("INSERT INTO a store appends; INSERT INTO non-store delegates to Catalyst") {
    import spark.implicits._
    KeyedStore.put("ins_store", Seq((1, "a")).toDF("k", "v"))
    sql.execute("INSERT INTO ins_store SELECT 2 AS k, 'b' AS v")
    assert(KeyedStore.get(spark, "ins_store").count() === 2)
    // append (not upsert): duplicate key adds a row
    sql.execute("INSERT INTO ins_store SELECT 2 AS k, 'b2' AS v")
    assert(KeyedStore.get(spark, "ins_store").count() === 3)
    KeyedStore.drop("ins_store")
  }

  test("inline TABLE(GENERATE_SERIES) and TABLE(PARQUET_FILE) rewrite to Catalyst plans") {
    val sum = sql.execute(
      "SELECT sum(v) AS s FROM TABLE(GENERATE_SERIES(1, 100))").collect().head.getLong(0)
    assert(sum === 5050L)
    val n = sql.execute(
      s"SELECT count(*) AS n FROM TABLE(PARQUET_FILE('$sf/region.parquet'))")
      .collect().head.getLong(0)
    assert(n > 0)
  }

  test("native expressions are SQL-callable via GraftExtensions") {
    val dot = sql.execute(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(dot === 32.0)
    val sq = sql.execute(
      "SELECT graft_sqdist(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(sq === 8.0)
    val sig = sql.execute(
      """SELECT graft_minhash(array(
        |  named_struct('h1', 9L, 'h2', 1L),
        |  named_struct('h1', 3L, 'h2', 2L)), 4) AS sig""".stripMargin)
      .collect().head.getSeq[Long](0)
    assert(sig.length === 4)
  }

  test("SHOW JOBS lists registered jobs; DROP JOB on missing job reports") {
    val msg = sql.execute("DROP JOB nonexistent_job").collect().head.getString(0)
    assert(msg.contains("not found"))
    assert(sql.execute("SHOW JOBS").columns.toSeq === Seq("name", "running"))
  }

  test("inline TABLE(GENERATE_STREAM) rewrites to an unbounded rate stream") {
    // Jet: SELECT * FROM TABLE(GENERATE_STREAM(100)) is an infinite stream of
    // v = 0,1,2,… at 100 rows/s (StreamGeneratorTableFunction.java)
    val df = sql.execute("SELECT v, v * 2 AS v2 FROM TABLE(GENERATE_STREAM(100))")
    assert(df.isStreaming, "GENERATE_STREAM must produce a streaming relation")
    assert(df.columns.toSeq === Seq("v", "v2"))
  }

  test("streaming SELECT cursor drains ≥2 incremental batches (Jet SqlResult iterator)") {
    val cur = sql.cursor("SELECT v FROM TABLE(GENERATE_STREAM(200)) WHERE v % 2 = 0")
    try {
      assert(cur.isStreaming)
      val first = cur.fetch(timeoutMs = 30000)
      assert(first.nonEmpty, "first incremental batch never arrived")
      val second = cur.fetch(timeoutMs = 30000)
      assert(second.nonEmpty, "second incremental batch never arrived")
      // rows are the filtered stream values, no overlap between fetches
      val all = (first ++ second).map(_.getLong(0))
      assert(all.forall(_ % 2 == 0))
      assert(all.distinct.length === all.length, "cursor re-delivered rows")
      assert(cur.rowsFetched === all.length)
    } finally cur.close()
  }

  test("cursor fetch is O(new): drains a 3rd batch incrementally, buffer bounded when unfetched") {
    // small bound: the stream produces ~200 rows/s but the queue may hold at
    // most 64 undelivered rows — an unfetched cursor must plateau there
    // (backpressure on the micro-batch thread), not grow with runtime
    val cur = sql.cursor("SELECT v FROM TABLE(GENERATE_STREAM(200))",
      maxBufferedRows = 64)
    try {
      val b1 = cur.fetch(timeoutMs = 30000)
      val b2 = cur.fetch(timeoutMs = 30000)
      val b3 = cur.fetch(timeoutMs = 30000)
      assert(b1.nonEmpty && b2.nonEmpty && b3.nonEmpty, "three incremental batches")
      val all = (b1 ++ b2 ++ b3).map(_.getLong(0))
      assert(all.distinct.length === all.length, "a later fetch re-delivered earlier rows")
      assert(cur.rowsFetched === all.length)
      // stop fetching; the buffer must saturate at the bound, not keep growing
      Thread.sleep(1500)
      assert(cur.bufferedRows <= 64,
        s"unfetched buffer grew past the bound: ${cur.bufferedRows}")
      // and the stream still delivers correctly once the client resumes
      assert(cur.fetch(timeoutMs = 30000).nonEmpty)
    } finally cur.close()
  }

  test("cursor in complete mode delivers fresh full snapshots, not stale tails") {
    // a streaming aggregate: the memory sink REWRITES the whole table per
    // batch in complete mode — a count-based tail would return empty forever
    // once the row count stabilizes (here: always exactly 1 row)
    val cur = sql.cursor(
      "SELECT count(*) AS n FROM TABLE(GENERATE_STREAM(100))", "complete")
    try {
      val first = cur.fetch(timeoutMs = 30000)
      assert(first.nonEmpty, "first snapshot never arrived")
      val n1 = first.head.getLong(0)
      val second = cur.fetch(timeoutMs = 30000)
      assert(second.nonEmpty, "updated snapshot never delivered (stale-tail bug)")
      assert(second.head.getLong(0) > n1, "second snapshot did not grow")
    } finally cur.close()
  }

  test("cursor over a batch statement returns one final batch then drains empty") {
    val cur = sql.cursor("SELECT v FROM TABLE(GENERATE_SERIES(1, 5))")
    try {
      assert(!cur.isStreaming)
      val rows = cur.fetch(timeoutMs = 5000)
      assert(rows.map(_.getLong(0)).sorted === Seq(1L, 2L, 3L, 4L, 5L))
      assert(cur.fetch(timeoutMs = 200).isEmpty)
    } finally cur.close()
  }
}
