package graft.pipeline

import java.sql.DriverManager
import java.util.Properties

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Jet `Sources.jdbc` / `Sinks.jdbc` parity (reference Sources.java:1285-1321,
  * Sinks.java:1246, mirrored from the reference's H2-backed JdbcSourceTest /
  * JdbcSinkTest) — run here against embedded Derby, the same in-process
  * pattern: real connections, real SQL, no network.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val props = new Properties()

  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    withConn { c =>
      val st = c.createStatement()
      st.execute("CREATE TABLE people(id INT PRIMARY KEY, name VARCHAR(32), score DOUBLE)")
      val ins = c.prepareStatement("INSERT INTO people VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i); ins.setString(2, s"name$i"); ins.setDouble(3, i * 0.5)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    }
  }

  test("jdbc source reads a table through a single connection") {
    val df = Pipeline.create(spark).readFrom(Sources.jdbc(url, "people", props)).ds
    assert(df.count() === 100)
    assert(df.agg(sum("id")).head.getLong(0) === 5050)
  }

  test("jdbc source parallel form splits the key range across partitions") {
    val src = Sources.jdbc(url, "people", props,
      partitionColumn = "id", lowerBound = 1, upperBound = 101, numPartitions = 4)
    val df = Pipeline.create(spark).readFrom(src).ds
    assert(df.rdd.getNumPartitions === 4, "expected one partition per connection stride")
    // strides must partition the table: no dropped or duplicated rows
    assert(df.count() === 100)
    assert(df.select("id").distinct().count() === 100)
  }

  test("jdbc query source pushes arbitrary SQL to the database") {
    val df = Pipeline.create(spark)
      .readFrom(Sources.jdbcQuery(url,
        "SELECT name, score FROM people WHERE id <= 10", props)).ds
    assert(df.count() === 10)
    assert(df.columns.toSeq.map(_.toLowerCase) === Seq("name", "score"))
  }

  test("jdbc sink appends and round-trips through the database") {
    withConn(_.createStatement().execute(
      "CREATE TABLE scores_out(id INT, total DOUBLE)"))
    val out = Pipeline.create(spark).readFrom(Sources.jdbc(url, "people", props))
      .toDF.groupBy((col("id") % 10).cast("int").as("id"))
      .agg(sum("score").as("total"))
    Sinks.jdbc(url, "scores_out", props).write(out)
    val back = spark.read.jdbc(url, "scores_out", props)
    assert(back.count() === 10)
    // second write appends (Jet Sinks.jdbc is insert-per-item, not replace)
    Sinks.jdbc(url, "scores_out", props).write(out.limit(3))
    assert(spark.read.jdbc(url, "scores_out", props).count() === 13)
  }
}
