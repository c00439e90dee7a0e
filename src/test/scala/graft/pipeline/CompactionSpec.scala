package graft.pipeline

import graft.SparkSpec

/** Small-file compaction: fewer files, identical data, no-op when already
  * right-sized, and the swap leaves no staging/retired debris.
  */
class CompactionSpec extends SparkSpec {

  import spark.implicits._

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction merges tiny files and preserves the data exactly") {
    val work = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val dir = s"$work/t"
    (1 to 2000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(50).write.parquet(dir)
    assert(parquetFiles(dir).length === 50)
    val beforeRows = spark.read.parquet(dir).collect().map(_.toString).sorted

    val bytes = parquetFiles(dir).map(_.length()).sum
    val report = Compaction.compactParquet(spark, dir, targetBytes = bytes)
    assert(report.compacted && report.filesBefore === 50)
    assert(report.filesAfter < 50 && report.filesAfter >= 1)
    assert(parquetFiles(dir).length === report.filesAfter)

    val afterRows = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(afterRows === beforeRows, "compaction changed the data")
    // no staging/retired debris next to the live dir
    val siblings = new java.io.File(work).listFiles().map(_.getName).toSet
    assert(siblings === Set("t"), s"swap debris left behind: $siblings")
    TempFiles.deleteTree(work)
  }

  test("already right-sized directories are left untouched") {
    val work = java.nio.file.Files.createTempDirectory("graft_compact2_").toString
    val dir = s"$work/t"
    (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .coalesce(1).write.parquet(dir)
    val before = parquetFiles(dir).map(f => f.getName -> f.lastModified()).toMap
    val report = Compaction.compactParquet(spark, dir, targetBytes = 1L)
    assert(!report.compacted)
    val after = parquetFiles(dir).map(f => f.getName -> f.lastModified()).toMap
    assert(after === before, "no-op compaction rewrote files")
    TempFiles.deleteTree(work)
  }
}
