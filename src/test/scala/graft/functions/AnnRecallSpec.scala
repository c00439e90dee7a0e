package graft.functions

import graft.SparkSpec

/** Multi-probe IVF property (q74/q75): probing a second cell only ADDS
  * candidates, so per-query recall@3 must be monotone non-decreasing in the
  * probe count, and on the fixture the second probe must strictly help in
  * aggregate — the reason multi-probe exists.
  */
class AnnRecallSpec extends SparkSpec {

  import spark.implicits._

  test("IVF recall@3 is monotone in probes and strictly improves at probes=2") {
    val recall = graft.queries.EmbeddingQueries.q74_ann_recall(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getDouble(2)).toMap
    val queries = recall.keys.map(_._2).toSeq.distinct
    assert(queries.nonEmpty)
    queries.foreach { q =>
      assert(recall(("ivf_p2", q)) >= recall(("ivf_p1", q)),
        s"query $q: probes=2 recall below probes=1")
    }
    val avg1 = queries.map(q => recall(("ivf_p1", q))).sum / queries.size
    val avg2 = queries.map(q => recall(("ivf_p2", q))).sum / queries.size
    assert(avg2 > avg1, s"second probe bought nothing: $avg1 vs $avg2")
  }
}
