package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftops.Bridge

/** Bloom-filter membership primitives, exposed from Catalyst's own runtime-
  * filter machinery (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * expressions Spark's InjectRuntimeFilter uses for shuffle-join pruning),
  * reused here as first-class engine operators.
  *
  * The 100 TB decontamination problem they solve: when the reference key set
  * is too big to broadcast as data (billions of fingerprints), a bloom filter
  * of it still fits in a few hundred MB and prunes the probe side BEFORE the
  * shuffle — rows that cannot match never leave their input partition. Bloom
  * membership has false positives but NO false negatives, so the pattern is
  * always prefilter → exact confirm (semi-join); the result stays exact, the
  * shuffle shrinks to near-candidates (q90).
  *
  * Both operators hash with xxhash64 on BOTH sides — agg and probe must use
  * the same hash for membership to be sound.
  */
object BloomFunctions {

  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
  import org.apache.spark.sql.types.LongType

  /** Expression-level builders — the ONE place the shared-hash invariant
    * lives: agg and probe both wrap their input in XxHash64; SQL surface
    * (GraftExtensions) and Column API below must build through these, so the
    * hash can never drift between the two (a drift would be silent false
    * negatives — the exact failure the q90 pattern's soundness rests on).
    */
  def bloomAggExpr(child: Expression, expectedItems: Expression): BloomFilterAggregate =
    new BloomFilterAggregate(new XxHash64(Seq(child)), Cast(expectedItems, LongType))

  def mightContainExpr(bloom: Expression, value: Expression): Expression =
    BloomFilterMightContain(bloom, new XxHash64(Seq(value)))

  /** Aggregate a column into a serialized bloom filter (BINARY). Size the
    * filter for the EXPECTED distinct count; Catalyst derives optimal bits.
    */
  def bloomAgg(col: Column, expectedItems: Long): Column =
    Bridge.column(bloomAggExpr(
      Bridge.expression(col),
      org.apache.spark.sql.catalyst.expressions.Literal(expectedItems))
      .toAggregateExpression())

  /** Row-local membership probe against a serialized bloom filter (usually a
    * collected literal or broadcast scalar). No false negatives; false-
    * positive rate set by the agg sizing. Codegen'd, stays in the scan stage.
    */
  def mightContain(bloom: Column, col: Column): Column =
    Bridge.column(mightContainExpr(Bridge.expression(bloom), Bridge.expression(col)))
}
