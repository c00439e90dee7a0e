package graft.pipeline

import graft.SparkSpec
import graft.streaming.StreamRunner
import java.sql.Timestamp

/** The replay staging cache must key on the input's SOURCE PATHS, not just
  * its canonicalized plan shape — canonicalization erases parquet paths, so
  * without the path component two same-shaped tables from different
  * directories would silently share one staging (wrong streamed results in
  * any JVM touching two fixture dirs, e.g. ScaleTrend).
  */
class StreamRunnerCacheSpec extends SparkSpec {

  import spark.implicits._

  test("same-shaped inputs from different dirs do not share a staging") {
    val work = java.nio.file.Files.createTempDirectory("graft_cachespec_").toString
    def write(dir: String, n: Int): Unit =
      (1 to n).map(i => (new Timestamp(1700000000000L + i * 1000L), i.toLong))
        .toDF("ts", "v").write.parquet(dir)
    write(s"$work/a", 7)
    write(s"$work/b", 13)
    // identical schema and plan shape; only the directory differs
    val ra = StreamRunner.replayFiles(spark, spark.read.parquet(s"$work/a"), "ts", "append")(identity)
    val rb = StreamRunner.replayFiles(spark, spark.read.parquet(s"$work/b"), "ts", "append")(identity)
    assert(ra.count() === 7L)
    assert(rb.count() === 13L, "second replay reused the first directory's staged chunks")
    TempFiles.deleteTree(work)
  }

  test("a vanished cached staging is re-staged, not replayed empty") {
    val work = java.nio.file.Files.createTempDirectory("graft_cachespec2_").toString
    (1 to 5).map(i => (new Timestamp(1700000000000L + i * 1000L), i.toLong))
      .toDF("ts", "v").write.parquet(s"$work/c")
    val in = spark.read.parquet(s"$work/c")
    assert(StreamRunner.replayFiles(spark, in, "ts", "append")(identity).count() === 5L)
    // simulate /tmp pruning: remove THIS JVM's cached stagings only (other
    // processes on the box may have live graft_freplay_base_* dirs)
    StreamRunner.stagedDirs.foreach(d => TempFiles.deleteTree(d))
    assert(StreamRunner.replayFiles(spark, in, "ts", "append")(identity).count() === 5L,
      "stale cache hit after external cleanup — replayed an empty stream")
    TempFiles.deleteTree(work)
  }

  test("a PARTIALLY pruned staging (one file gone, skeleton intact) is re-staged") {
    val work = java.nio.file.Files.createTempDirectory("graft_cachespec3_").toString
    (1 to 11).map(i => (new Timestamp(1700000000000L + i * 1000L), i.toLong))
      .toDF("ts", "v").write.parquet(s"$work/d")
    val in = spark.read.parquet(s"$work/d")
    val before = StreamRunner.stagedDirs.toSet
    assert(StreamRunner.replayFiles(spark, in, "ts", "append")(identity).count() === 11L)
    // file-level /tmp pruning: delete exactly ONE staged parquet file; the
    // chunk dirs all still exist and still contain parquet files, so the
    // round-4 existence-only check would accept the truncated staging
    val staged = (StreamRunner.stagedDirs.toSet -- before).head
    val victim = new java.io.File(staged).listFiles()
      .filter(_.getName.startsWith("__chunk=")).sortBy(_.getName)
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
      .head
    assert(victim.delete())
    assert(StreamRunner.replayFiles(spark, in, "ts", "append")(identity).count() === 11L,
      "truncated staging passed revalidation — rows were silently dropped")
    TempFiles.deleteTree(work)
  }

  test("an in-place source rewrite between replays is not served the old staging") {
    val work = java.nio.file.Files.createTempDirectory("graft_cachespec4_").toString
    def write(n: Int): Unit = {
      TempFiles.deleteTree(s"$work/e")
      (1 to n).map(i => (new Timestamp(1700000000000L + i * 1000L), i.toLong))
        .toDF("ts", "v").write.parquet(s"$work/e")
    }
    write(4)
    assert(StreamRunner.replayFiles(spark, spark.read.parquet(s"$work/e"), "ts", "append")(identity)
      .count() === 4L)
    // rewrite the SAME path with different data: same plan, same source
    // paths — only the file (size, mtime) stamp distinguishes it
    write(6)
    assert(StreamRunner.replayFiles(spark, spark.read.parquet(s"$work/e"), "ts", "append")(identity)
      .count() === 6L, "stale staging served after an in-place source rewrite")
    TempFiles.deleteTree(work)
  }

  test("same-schema IN-MEMORY inputs never share a staging (uncacheable)") {
    // canonicalization erases LocalRelation data, so these two frames are
    // indistinguishable by plan+paths — they must bypass the cache entirely
    def df(n: Int) = (1 to n).map(i => (new Timestamp(1700000000000L + i * 1000L), i.toLong))
      .toDF("ts", "v")
    assert(StreamRunner.replayFiles(spark, df(3), "ts", "append")(identity).count() === 3L)
    assert(StreamRunner.replayFiles(spark, df(9), "ts", "append")(identity).count() === 9L,
      "second in-memory replay reused the first input's staged chunks")
  }
}
