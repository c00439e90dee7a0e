package graft.functions

import graft.SparkSpec

/** connectedComponents correctness on known graphs (drives q47). */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)], threshold: Long = 2000000L): Map[Long, Long] =
    DedupFunctions.connectedComponents(pairs.toDF("a", "b"), "a", "b",
      smallGraphThreshold = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, and isolated pair resolve to component minima") {
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), // chain
      (10L, 11L), (11L, 12L), (10L, 12L),             // triangle
      (20L, 21L)))                                    // pair
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain converges in O(log n) rounds (pointer jumping)") {
    val n = 64L
    val labels = cc((1L until n).map(i => (i, i + 1)))
    assert(labels.size === n.toInt && labels.values.forall(_ === 1L))
  }

  test("components joined by a bridge edge merge") {
    val labels = cc(Seq((1L, 2L), (5L, 6L), (2L, 5L)))
    assert(labels.values.toSet === Set(1L))
  }

  test("distributed pointer-jumping path (threshold 0) matches the union-find fast path") {
    val graph = (1L until 40L).map(i => (i, i + 1)) ++ // long chain
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L))
    val fast = cc(graph)
    val distributed = cc(graph, threshold = 0L)
    assert(fast === distributed)
  }

  test("edges with a null endpoint are dropped, not NPE'd, on both paths") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = true),
      StructField("b", LongType, nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(1L, 2L), Row(null, 3L), Row(4L, null), Row(2L, 5L))
    val pairs = spark.createDataFrame(rows, schema)
    Seq(2000000L, 0L).foreach { threshold =>
      val labels = DedupFunctions.connectedComponents(pairs, "a", "b",
        smallGraphThreshold = threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // only the non-null edges contribute: {1,2,5} one component; 3 and 4
      // appear in no surviving edge, so they are absent entirely
      assert(labels === Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
    }
  }

  test("fast path preserves non-long integral id types") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", IntegerType)))
    val pairs = spark.createDataFrame(
      java.util.Arrays.asList(Row(7, 3), Row(3, 9)), schema)
    val out = DedupFunctions.connectedComponents(pairs, "a", "b")
    assert(out.schema.fields.map(_.dataType).toSeq === Seq(IntegerType, IntegerType))
    val labels = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(labels === Map(3 -> 3, 7 -> 3, 9 -> 3))
  }
}
