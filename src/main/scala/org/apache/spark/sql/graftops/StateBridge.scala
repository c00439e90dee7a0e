package org.apache.spark.sql.graftops

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.streaming.state.{
  NoPrefixKeyStateEncoderSpec, PrefixKeyScanStateEncoderSpec, StateStoreConf,
  StateStoreId, StateStoreProvider, StateStoreProviderId}
import org.apache.spark.sql.types.StructType

/** State-store WRITE access for the offline rescale rewrite
  * (graft.streaming.StateRescale). Spark 4 ships a state READER (the
  * `statestore` data source) but no writer; bootstrapping a checkpoint at a
  * new partition width therefore goes through the provider API directly —
  * `private[sql]`, reached from this sanctioned extension sub-package like
  * [[Bridge]]. The provider class (HDFS-backed or RocksDB) is taken from
  * `StateStoreConf`, so the rewrite works under either provider.
  */
object StateBridge {

  /** A serializable StateStoreConf seeded from the session conf plus the
    * checkpoint's own recorded entries (offset-log `conf` map) — the rewrite
    * must honor the ORIGINAL run's provider class, format versions, and
    * compression codec, not whatever the current session happens to use.
    */
  def stateStoreConf(
      spark: SparkSession,
      checkpointConf: Map[String, String]): StateStoreConf = {
    val c = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.clone()
    checkpointConf.foreach { case (k, v) => c.setConfString(k, v) }
    StateStoreConf(c)
  }

  /** Write one state partition of a rewritten checkpoint: creates the
    * provider at `<stateRoot>/<operatorId>/<partitionId>[/<storeName>]`, puts
    * every (key, value) Row into version 1, then commits empty versions up to
    * `targetVersion` (delta files for HDFS, changelogs for RocksDB) so the
    * resumed query — which continues the ORIGINAL batch numbering and
    * therefore loads state version `lastCommittedBatch + 1` — finds a
    * complete version chain. Batch numbering must be preserved because sinks
    * with idempotent batch tracking (FileSink `_spark_metadata`, XA/Kafka
    * batch-id fencing) silently SKIP a replayed batch id, which would skip
    * the first post-rescale state commit with it.
    *
    * The caller is responsible for routing rows to the partition that
    * `HashPartitioning(keyColumns, newWidth)` would choose — Spark replays
    * that distribution when the query resumes.
    */
  def writeStatePartition(
      stateRoot: String,
      operatorId: Long,
      partitionId: Int,
      storeName: String,
      keySchema: StructType,
      valueSchema: StructType,
      conf: StateStoreConf,
      targetVersion: Long,
      rows: Iterator[(Row, Row)],
      numColsPrefixKey: Int = 0): Unit = {
    require(targetVersion >= 1, s"targetVersion must be >= 1, got $targetVersion")
    val providerId = StateStoreProviderId(
      StateStoreId(stateRoot, operatorId, partitionId, storeName),
      java.util.UUID.randomUUID())
    // prefix-scan stores (session windows) must keep their encoder spec, or
    // the resumed operator's range scans read garbage
    val encoderSpec =
      if (numColsPrefixKey > 0) PrefixKeyScanStateEncoderSpec(keySchema, numColsPrefixKey)
      else NoPrefixKeyStateEncoderSpec(keySchema)
    val provider = StateStoreProvider.createAndInit(
      providerId, keySchema, valueSchema, encoderSpec,
      useColumnFamilies = false, conf, new Configuration(),
      useMultipleValuesPerKey = false, None)
    try {
      val keySer = ExpressionEncoder(keySchema).createSerializer()
      val valSer = ExpressionEncoder(valueSchema).createSerializer()
      val keyProj = UnsafeProjection.create(keySchema)
      val valProj = UnsafeProjection.create(valueSchema)
      var version = 0L
      while (version < targetVersion) {
        val store = provider.getStore(version, None)
        if (version == 0) rows.foreach { case (k, v) =>
          store.put(keyProj(keySer(k)), valProj(valSer(v)), "default")
        }
        version = store.commit()
      }
    } finally provider.close()
  }
}
