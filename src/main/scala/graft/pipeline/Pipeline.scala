package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Jet-parity pipeline facade (reference: hazelcast-jet-core/src/main/java/com/
  * hazelcast/jet/pipeline/Pipeline.java).
  *
  * In Jet, `Pipeline.create()` builds a Transform DAG that a Planner compiles to
  * vertices and edges. In this engine there is deliberately NO such layer: a stage
  * wraps a `Dataset`, every transform is a Catalyst logical-plan node, and planning
  * (operator fusion, two-phase aggregation, shuffle placement, codegen) is
  * Catalyst's job — SURVEY.md §4.1 shows every Jet planner rewrite is a Catalyst
  * built-in. What remains of "the engine" is this thin, typed fluent API plus the
  * aggregate-operation and windowing vocabulary Jet users expect.
  */
final class Pipeline(val spark: SparkSession) {

  /** Bounded input → BatchStage (Jet: `readFrom(BatchSource)`). */
  def readFrom[T](source: BatchSource[T]): BatchStage[T] =
    new BatchStage[T](source.read(spark))

  /** Unbounded input → StreamSourceStage (Jet: `readFrom(StreamSource)`);
    * call `.withNativeTimestamps()` / `.withTimestamps(col, lag)` next, exactly
    * like Jet's `StreamSourceStage`.
    */
  def readFrom(source: StreamSource): StreamSourceStage =
    new StreamSourceStage(source.read(spark))

  /** Jet `JobConfig.attachFile` (config/JobConfig.java:586): ship a resource
    * file with the job; tasks resolve it with `Attachments.attachedFile`.
    */
  def attachFile(path: String): Pipeline = { Attachments.attachFile(spark, path); this }

  def attachFile(path: String, id: String): Pipeline = {
    Attachments.attachFile(spark, path, id); this
  }

  /** Jet `JobConfig.attachDirectory`. */
  def attachDirectory(path: String): Pipeline = {
    Attachments.attachDirectory(spark, path); this
  }

  /** Escape hatch: wrap an existing Dataset. */
  def wrap[T](ds: Dataset[T]): BatchStage[T] = new BatchStage[T](ds)

  def wrapStream(df: DataFrame): StreamSourceStage = new StreamSourceStage(df)
}

object Pipeline {
  /** Jet: `Pipeline.create()` (pipeline/Pipeline.java:60). */
  def create(spark: SparkSession): Pipeline = new Pipeline(spark)
}
