package graft.functions

import org.apache.spark.sql.DataFrame

/** Input-width control for CPU-dense per-row passes.
  *
  * Spark sizes scan parallelism by BYTES (`spark.sql.files.maxPartitionBytes`),
  * which is the wrong width for operators whose per-row cost is ~100k× their
  * input bytes (md5-per-token signature builds, tokenize+explode passes): a
  * single small parquet file becomes one scan partition and the whole corpus
  * is processed on one core while the rest of the cluster idles (r7 profile:
  * the 594 KB documents fixture ran q47's signature build as one 2.2 s task).
  *
  * `widen` repartitions to cluster width ONLY when the input is narrower than
  * half of it. The guard is the scale argument: a 100 TB corpus already
  * arrives in thousands of scan partitions and passes through untouched — the
  * repartition shuffle fires exactly when it is small by construction (few
  * partitions, each bounded by maxPartitionBytes).
  *
  * Jet has no analog: the reference assigns one processor per core regardless
  * of input layout (core/processor/SourceProcessors.java) — this helper is
  * what restores that property under Spark's byte-based scan splitting.
  */
object Width {

  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val n = try df.rdd.getNumPartitions catch { case _: Throwable => target }
    if (n * 2 <= target) df.repartition(target) else df
  }
}
