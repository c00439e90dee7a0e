package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator the reference lacks entirely (SURVEY §2.5: "sort
  * merge / range / as-of ... absent") and Spark has no built-in for either:
  * for every left row, attach the LATEST right row with `rightTs <= leftTs`
  * for the same key (backward as-of; the market-data / feature-lookup join).
  *
  * Composed from existing operators (the preferred extension path — no custom
  * plan node needed): tag both sides, union, then one window pass per key in
  * time order carrying the last-seen right values forward. Cost at any scale:
  * ONE shuffle on the key + ONE in-partition sort — same price as a regular
  * sort-merge join, with none of the range-explosion a naive
  * `join(l.ts >= r.ts)` theta join would cause (that one produces O(n·m)
  * intermediate rows before aggregation; this produces O(n+m)).
  */
object AsofJoin {

  /** @param rightVals right columns carried to the matched left rows
    * @param how "inner" drops unmatched left rows, "left" keeps them with nulls
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String, rightVals: Seq[String],
            how: String = "inner"): DataFrame = {
    require(how == "inner" || how == "left", s"asof join: inner|left, got $how")
    val leftCols = left.columns.toSeq
    // tag: right rows sort BEFORE left rows at equal timestamps, so an exact
    // timestamp match counts as "at or before".
    // All right values ride in ONE struct carried by ONE last(ignoreNulls)
    // window: per-column carries could stitch values from DIFFERENT right rows
    // when a carried column is legitimately NULL, and a NULL head value would
    // misclassify a matched row as unmatched. The struct itself is never null
    // for a real right row, so one carry is both correct and cheaper.
    // JOIN NULL SEMANTICS: a right row with a NULL key or NULL timestamp can
    // never legitimately match (NULL = NULL is not a join match, and no
    // leftTs satisfies rightTs <= leftTs for NULL rightTs) — but the window
    // formulation would carry it (null keys share a partition; a null __ts
    // sorts first and becomes everyone's match). Filter them out up front;
    // null-key LEFT rows then sit in a partition with no right rows and come
    // out unmatched, exactly like a join.
    val r0 = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key), col(rightTs).as("__ts"),
        struct(rightVals.map(v => col(v).as(v)): _*).as("__r"))
      .withColumn("__side", lit(0))
    val rStructType = r0.schema("__r").dataType
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val rAligned = leftCols.filterNot(_ == key).foldLeft(r0)((d, c) =>
      d.withColumn(c, lit(null)))

    val unioned = l.unionByName(rAligned.select(l.columns.map(col): _*))
    // xxhash64(__r) as the final sort key: two right rows tying on
    // (ts, side) would otherwise carry a partitioning-dependent winner —
    // value-derived tiebreak keeps the result bit-stable across runs/engines
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), xxhash64(col("__r")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))

    val matchedOnly =
      if (how == "inner") carried.filter(col("__m").isNotNull)
      else carried
    matchedOnly.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(v => col("__m").getField(v).as(v)): _*)
  }

  /** Range join: all (left, right) pairs with `|leftTs - rightTs| <= tolerance`
    * per key — composed as an equi-join on (key, time bucket) with the exact
    * range predicate applied after, so the join never degenerates to a per-key
    * cross product: each row lands in 2 buckets, candidates are bucket-local.
    */
  def range(left: DataFrame, right: DataFrame, key: String,
            leftTs: String, rightTs: String, toleranceSec: Long): DataFrame = {
    require(toleranceSec > 0,
      s"range join: toleranceSec must be > 0 (got $toleranceSec); " +
        "use an equi-join on (key, ts) for exact-timestamp matches")
    // right columns clashing with left names (beyond the merged key) are
    // suffixed _r — both sides' columns survive into the output unambiguously
    val clash = right.columns.toSet.intersect(left.columns.toSet) - key
    val rRenamed = clash.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"${c}_r"))
    val rTs = if (clash.contains(rightTs)) s"${rightTs}_r" else rightTs
    // the ±tolerance window spans at most the 3 buckets around the left row's;
    // a right row lands in exactly ONE bucket and the left row's three bucket
    // ids are distinct, so no (left, right) pair can appear twice — no dedup
    val lb = left.withColumn("__b", explode(array(
      floor(unix_timestamp(col(leftTs)) / toleranceSec) - 1,
      floor(unix_timestamp(col(leftTs)) / toleranceSec),
      floor(unix_timestamp(col(leftTs)) / toleranceSec) + 1)))
    val rb = rRenamed.withColumn("__b", floor(unix_timestamp(col(rTs)) / toleranceSec))
    lb.join(rb, Seq(key, "__b"))
      .filter(abs(unix_timestamp(col(leftTs)) - unix_timestamp(col(rTs))) <= toleranceSec)
      .drop("__b")
  }
}
