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

  // roots read through this pipeline, for isEmpty/toDotString (Jet's
  // Pipeline tracks its Transform DAG; here each root IS a Catalyst plan)
  private val roots = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
  private var preserveOrder = false

  /** Jet `Pipeline.isEmpty` (Pipeline.java): no sources read yet. */
  def isEmpty: Boolean = synchronized(roots.isEmpty)

  /** Jet `setPreserveOrder` (Pipeline.java): request that stateless stages
    * keep event order. The Spark mapping: NARROW chains (map/filter/flatMap/
    * service transforms) preserve intra-partition order automatically —
    * Spark never round-robins between narrow operators, so the constraint
    * Jet's planner must enforce holds here by construction. Anything that
    * shuffles (groupBy, join, `rebalance`, repartition) reorders in BOTH
    * engines; Jet's flag does not survive those either. The flag is
    * recorded for API parity and read back via `isPreserveOrder`.
    */
  def setPreserveOrder(value: Boolean): Pipeline = synchronized {
    preserveOrder = value; this
  }

  def isPreserveOrder: Boolean = synchronized(preserveOrder)

  /** Jet `Pipeline.toDotString()`: GraphViz DOT of every root's logical
    * plan read through this pipeline (stage-level `toDotString` renders a
    * single stage's DAG).
    */
  def toDotString: String = synchronized {
    roots.map(PlanDot.toDotString).mkString("\n")
  }

  private def track[D <: Dataset[_]](d: D): D = synchronized { roots += d; d }

  /** Bounded input → BatchStage (Jet: `readFrom(BatchSource)`). */
  def readFrom[T](source: BatchSource[T]): BatchStage[T] =
    new BatchStage[T](track(source.read(spark)))

  /** Unbounded input → StreamSourceStage (Jet: `readFrom(StreamSource)`);
    * call `.withNativeTimestamps()` / `.withTimestamps(col, lag)` next, exactly
    * like Jet's `StreamSourceStage`.
    */
  def readFrom(source: StreamSource): StreamSourceStage =
    new StreamSourceStage(track(source.read(spark)))

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
  def wrap[T](ds: Dataset[T]): BatchStage[T] = new BatchStage[T](track(ds))

  def wrapStream(df: DataFrame): StreamSourceStage =
    new StreamSourceStage(track(df))
}

object Pipeline {
  /** Jet: `Pipeline.create()` (pipeline/Pipeline.java:60). */
  def create(spark: SparkSession): Pipeline = new Pipeline(spark)
}
