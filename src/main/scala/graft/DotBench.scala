package graft
import org.apache.spark.sql.SparkSession

/** Warm A/B micro-benchmark for expression-level optimizations (native
  * Catalyst expressions vs higher-order folds). Toggles: GRAFT_DOT_FOLD,
  * GRAFT_MINHASH_FOLD. Full-bench runs have ±20% machine variance — decide
  * hot-path changes here, not there.
  */
object DotBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32", "dotbench")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = Seq("q40_cosine_topk", "q42_ann_lsh_topk", "q44_ann_ivf_topk",
      "q39_dedup_embedding", "q36_dedup_minhash_lsh", "q37_dedup_simhash", "q65_kmeans_ivf")
    names.foreach(n => SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save())
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[dotbench] $n min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
