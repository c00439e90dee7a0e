package graft.pipeline

import graft.SparkSpec

/** Pipeline-level API parity (Pipeline.java): isEmpty, setPreserveOrder /
  * isPreserveOrder, and the pipeline-wide toDotString over every root read
  * through the facade.
  */
class PipelineFacadeSpec extends SparkSpec {

  import spark.implicits._

  test("isEmpty flips once a source is read; toDotString covers every root") {
    val p = Pipeline.create(spark)
    assert(p.isEmpty, "fresh pipeline has no roots")
    p.wrap(Seq(1, 2, 3).toDS())
    assert(!p.isEmpty)
    p.wrap(Seq("x").toDS())
    val dot = p.toDotString
    assert(dot.linesIterator.count(_.contains("digraph")) == 2,
      s"one DOT graph per root:\n$dot")
  }

  test("preserve-order flag round-trips (narrow chains preserve order by construction)") {
    val p = Pipeline.create(spark)
    assert(!p.isPreserveOrder, "default matches the reference (false)")
    p.setPreserveOrder(true)
    assert(p.isPreserveOrder)
    // the property the flag asks for, demonstrated on a narrow chain: a
    // single-partition source through map/filter emits in input order
    val out = p.wrap(spark.range(100).repartition(1).as[Long])
      .map(_ * 2).filter(_ % 4 == 0).ds.collect()
    assert(out.toSeq == out.toSeq.sorted, "narrow chain kept intra-partition order")
  }
}
