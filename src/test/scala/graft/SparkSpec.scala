package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession fixture (one per suite; getOrCreate dedups). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.tune(
    SparkSession.builder().master("local[4]").appName("graft-test"),
    shufflePartitions = 4
  ).getOrCreate()

  lazy val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // shared session across suites — do not stop; just clear leftover streams
    graft.pipeline.JobRegistry.stopAll()
    super.afterAll()
  }
}
