package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-memory named KV/table store — the engine's stand-in for Hazelcast's IMap /
  * IList surface that Jet sources, sinks, and lookup joins depend on
  * (reference: Sources.map Sources.java:172, Sinks.map Sinks.java:136,
  * mapUsingIMap GeneralStage.java:678).
  *
  * Implementation: named cached DataFrames on the driver's catalog. Upsert is
  * last-writer-wins per key, implemented as union + keep-newest (a batch MERGE).
  * This is a correctness-first single-session stand-in: at 100 TB scale the
  * store's role is played by a real table format (Delta/Iceberg MERGE) — the
  * API here is the stable seam where that swap happens.
  */
object KeyedStore {

  private val tables = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val versionCol = "__graft_version"
  private val versions = new java.util.concurrent.atomic.AtomicLong(0)

  /** Change record: (op, version, key json, row json) — the map-journal entry
    * shape (reference: Sources.mapJournal EventJournalMapEvent; ADDED/UPDATED
    * collapse to UPSERT here, like Jet's default journal projection).
    */
  final case class Change(op: String, version: Long, key: String, value: String)

  // per-store change journals: MemoryStream sources created by `journal(name)`
  // and fed by upsert/delete (driver-side, like the store itself)
  private val journalStreams = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Change]]()

  // key columns last used to upsert each store, so SYNC records can emit the
  // SAME key shape as later UPSERT/DELETE records (the journal contract: state
  // keyed off `key` must be consistent for one entry across record types)
  private val storeKeys = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  private def recordChanges(name: String, df: DataFrame, keyCols: Seq[String], op: String): Unit =
    Option(journalStreams.get(name)).foreach { ms =>
      import org.apache.spark.sql.functions.{col, struct, to_json}
      val v = versions.incrementAndGet()
      val changes = df.select(
        to_json(struct(keyCols.map(col): _*)).as("k"),
        to_json(struct(df.columns.map(col): _*)).as("r")).collect()
        .map(r => Change(op, v, r.getString(0), r.getString(1)))
      if (changes.nonEmpty) ms.addData(changes.toIndexedSeq)
    }

  /** Jet `Sources.mapJournal` (Sources.java:381, StreamEventJournalP) with
    * `JournalInitialPosition` semantics (pipeline/JournalInitialPosition.java):
    * an unbounded stream of this store's changes as (op, version, key, value)
    * rows with JSON-encoded key/row. START_FROM_CURRENT (default) emits only
    * changes after subscription; `startFromOldest` first emits one SYNC record
    * per existing entry — Jet's initial-snapshot replay.
    */
  def journal(spark: SparkSession, name: String,
              startFromOldest: Boolean = false): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = journalStreams.computeIfAbsent(name, _ =>
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Change])
    if (startFromOldest && tables.containsKey(name)) {
      import org.apache.spark.sql.functions.{col, struct, to_json}
      val cur = get(spark, name)
      val v = versions.incrementAndGet()
      val keyCols = Option(storeKeys.get(name)).getOrElse(cur.columns.toSeq)
      val sync = cur.select(
        to_json(struct(keyCols.map(col): _*)).as("k"),
        to_json(struct(cur.columns.map(col): _*)).as("r")).collect()
        .map(r => Change("SYNC", v, r.getString(0), r.getString(1)))
      if (sync.nonEmpty) ms.addData(sync.toIndexedSeq)
    }
    ms.toDF()
  }

  def put(name: String, df: DataFrame): Unit = {
    tables.put(name, df.cache())
    df.createOrReplaceTempView(name)
  }

  def get(spark: SparkSession, name: String): DataFrame = {
    val df = Option(tables.get(name)).getOrElse(
      throw new IllegalArgumentException(s"KeyedStore: no table '$name'"))
    if (df.columns.contains(versionCol)) df.drop(versionCol) else df
  }

  def exists(name: String): Boolean = tables.containsKey(name)

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keySet().asScala.toSeq.sorted
  }

  /** Last-writer-wins upsert by key columns (Jet `Sinks.map` semantics: new
    * entries replace existing keys).
    */
  def upsert(name: String, df: DataFrame, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "upsert needs key columns")
    storeKeys.put(name, keyCols)
    val incoming = df.withColumn(versionCol, lit(versions.incrementAndGet()))
    val merged = Option(tables.get(name)) match {
      case None => incoming
      case Some(old) =>
        val oldV =
          if (old.columns.contains(versionCol)) old
          else old.withColumn(versionCol, lit(0L))
        val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
        oldV.unionByName(incoming)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
    }
    // materialize before caching so the store is stable even if inputs mutate
    val snap = merged.cache()
    snap.count()
    tables.put(name, snap)
    snap.drop(versionCol).createOrReplaceTempView(name)
    recordChanges(name, df, keyCols, "UPSERT")
  }

  /** Expression-based MERGE upsert — the engine behind Jet's merge-fn sinks
    * (`Sinks.mapWithMerging` Sinks.java:313, `mapWithUpdating` Sinks.java:451,
    * `UpdateMapP.java`): on key conflict, each value column is combined by a
    * caller-supplied expression over (old, incoming) instead of
    * last-writer-wins. Shape: old FULL OUTER JOIN incoming on the keys, then a
    * per-column conditional projection — a batch MERGE whose conflict logic is
    * a Catalyst expression, so the whole resolution runs in codegen (the Spark
    * analog of Jet's merge lambda, and the exact statement a Delta/Iceberg
    * `MERGE WHEN MATCHED THEN UPDATE SET` swap would take at 100 TB).
    *
    * `mergeFn`: value column → (old, incoming) → merged. Columns without an
    * entry take the incoming value on conflict (LWW).
    * `updateAlways=false` (merging): merge fns fire only when BOTH sides exist.
    * `true` (updating): fns fire for every incoming row; an absent old entry
    * reads as NULL columns — Jet passes `null` oldValue to updateFn.
    * `deleteWhen(old, incoming)`: matched rows where this predicate holds are
    * removed — Jet's "updateFn returned null removes the entry".
    */
  def upsertMerging(name: String, df: DataFrame, keyCols: Seq[String],
                    mergeFn: Map[String, (Column, Column) => Column],
                    updateAlways: Boolean = false,
                    deleteWhen: Option[(String => Column, String => Column) => Column] = None): Unit = {
    require(keyCols.nonEmpty, "upsertMerging needs key columns")
    storeKeys.put(name, keyCols)
    val spark = df.sparkSession
    val old = Option(tables.get(name))
      .map(t => if (t.columns.contains(versionCol)) t.drop(versionCol) else t)
      .getOrElse(spark.createDataFrame(new java.util.ArrayList[Row](), df.schema))
    val o = old.withColumn("__op", lit(true)).alias("__o")
    val n = df.withColumn("__np", lit(true)).alias("__n")
    val oc = (c: String) => col(s"__o.$c")
    val nc = (c: String) => col(s"__n.$c")
    // null-safe key equality: NULL keys merge like any other key value
    val joinCond = keyCols.map(k => oc(k) <=> nc(k)).reduce(_ && _)
    val joined = o.join(n, joinCond, "full_outer")
    val kept = deleteWhen.fold(joined)(p =>
      joined.filter(not(nc("__np").isNotNull && coalesce(p(oc, nc), lit(false)))))
    val valueCols = df.columns.filterNot(c => keyCols.contains(c))
    val keySel = keyCols.map(k => coalesce(nc(k), oc(k)).as(k))
    val valSel = valueCols.map { c =>
      val resolved = mergeFn.get(c) match {
        case Some(f) if updateAlways =>
          when(nc("__np").isNotNull, f(oc(c), nc(c))).otherwise(oc(c))
        case Some(f) =>
          when(oc("__op").isNotNull && nc("__np").isNotNull, f(oc(c), nc(c)))
            .when(nc("__np").isNotNull, nc(c)).otherwise(oc(c))
        case None =>
          when(nc("__np").isNotNull, nc(c)).otherwise(oc(c))
      }
      resolved.as(c)
    }
    val merged = kept.select(keySel ++ valSel: _*)
      .withColumn(versionCol, lit(versions.incrementAndGet()))
    val snap = merged.cache()
    snap.count()
    Option(tables.put(name, snap)).foreach(_.unpersist())
    snap.drop(versionCol).createOrReplaceTempView(name)
    // journal sees the post-merge values of the touched keys
    recordChanges(name,
      snap.drop(versionCol).join(df.select(keyCols.map(col): _*).dropDuplicates(),
        keyCols, "left_semi"),
      keyCols, "UPSERT")
  }

  /** Delete by key (CDC DELETE ops): anti-join against the key set. */
  def delete(name: String, keysDf: DataFrame, keyCols: Seq[String]): Unit = {
    Option(tables.get(name)).foreach { old =>
      val remaining = old.join(
        keysDf.select(keyCols.map(col): _*).dropDuplicates(), keyCols, "left_anti")
      val snap = remaining.cache()
      snap.count()
      tables.put(name, snap)
      val view = if (snap.columns.contains(versionCol)) snap.drop(versionCol) else snap
      view.createOrReplaceTempView(name)
      recordChanges(name, keysDf.select(keyCols.map(col): _*), keyCols, "DELETE")
    }
  }

  /** IList-style append. Journaled (op APPEND) so `Sinks.reliableTopic` readers
    * can subscribe to the list as a stream.
    */
  def append(name: String, df: DataFrame): Unit = {
    val merged = Option(tables.get(name)).map(_.unionByName(df)).getOrElse(df)
    val snap = merged.cache()
    snap.count()
    tables.put(name, snap)
    snap.createOrReplaceTempView(name)
    recordChanges(name, df, df.columns.toSeq, "APPEND")
  }

  def drop(name: String): Unit = {
    storeKeys.remove(name)
    Option(tables.remove(name)).foreach(_.unpersist())
  }

  def clear(): Unit = { names.foreach(drop); () }
}
