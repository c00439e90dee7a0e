package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational pass every large parquet lake
  * needs: streaming sinks, micro-batch jobs and fine-grained partitioning
  * leave directories of KB-scale files, and at 100 TB the resulting task
  * explosion (one scan task per tiny file) and namenode/listing pressure
  * dominate query time long before the data itself does.
  *
  * Spark-native shape: read → `coalesce(ceil(bytes / targetBytes))` (coalesce,
  * NOT repartition — narrowing file counts needs no shuffle) → write to a
  * sibling staging dir → swap (retire original, promote staging).
  *
  * Swap guarantees, stated precisely: the staging write completes (with
  * _SUCCESS) before the original dir is touched, so the live path NEVER
  * exposes a half-written mix. The swap itself is two renames, NOT atomic:
  * between retiring the original and promoting the staging there is a window
  * where the live path does not exist — concurrent readers in that window
  * see a missing directory, and a crash inside it leaves the data ONLY at
  * `<dir>__compact_retired` (recovery: rename it back by hand; nothing is
  * deleted until the promote succeeds). Run against quiescent directories,
  * or front with a catalog/symlink flip if readers can race the swap.
  *
  * Filesystem constraint: the renames are `java.io.File.renameTo` — LOCAL
  * filesystem only (and same-device). For object stores / HDFS, write the
  * compacted copy to a new path and flip the table location in the catalog
  * instead; this utility is the single-node/posix leg of that pattern.
  */
object Compaction {

  /** @param minFileBytes files at or above this size are "right-sized"; a dir
    *   whose average data file already meets it is left untouched.
    */
  case class Report(filesBefore: Int, filesAfter: Int, bytes: Long, compacted: Boolean)

  private def dataFiles(dir: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Compact a parquet directory's data files toward `targetBytes` apiece.
    * No-op (compacted = false) when the directory is already right-sized.
    */
  def compactParquet(spark: SparkSession, dir: String, targetBytes: Long,
                     minFileBytes: Long = 0L): Report = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = dataFiles(dir)
    val bytes = before.map(_.length()).sum
    val threshold = if (minFileBytes > 0) minFileBytes else targetBytes / 2
    if (before.length <= 1 || (bytes / math.max(1, before.length)) >= threshold)
      return Report(before.length, before.length, bytes, compacted = false)

    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val staging = dir.stripSuffix("/") + "__compact_staging"
    TempFiles.deleteTree(staging)
    // coalesce: narrow dependency, each output task concatenates input
    // splits — no shuffle, stable at any scale
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode("overwrite").parquet(staging)
    // swap: retire the original, promote the staging
    val retired = dir.stripSuffix("/") + "__compact_retired"
    TempFiles.deleteTree(retired)
    val dirF = new java.io.File(dir)
    require(dirF.renameTo(new java.io.File(retired)),
      s"compaction swap failed: cannot retire $dir")
    require(new java.io.File(staging).renameTo(dirF),
      s"compaction swap failed: cannot promote $staging (original retained at $retired)")
    TempFiles.deleteTree(retired)
    Report(before.length, dataFiles(dir).length, bytes, compacted = true)
  }
}
