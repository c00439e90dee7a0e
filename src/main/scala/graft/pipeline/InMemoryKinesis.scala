package graft.pipeline

/** In-JVM Kinesis-shaped stream service — the broker-side semantics the
  * reference's Kinesis connector programs against (extensions/kinesis/
  * src/main/java/com/hazelcast/jet/kinesis/KinesisSources.java and its
  * `impl/` shard readers), built from the PUBLIC AWS Kinesis data model:
  *
  *  - a stream is a set of SHARDS, each owning a hash-key range; a record
  *    routes to the shard whose range contains md5(partitionKey) — so one
  *    partition key always lands in one shard (per-key ordering);
  *  - each shard is an ordered log addressed by SEQUENCE NUMBERS;
  *    consumers iterate with shard iterators (TRIM_HORIZON /
  *    AFTER_SEQUENCE_NUMBER collapse to positions here);
  *  - RESHARDING: `splitShard` CLOSES the parent and opens two children
  *    splitting its hash range; records put after the split route to the
  *    children. The consumer-side ordering rule (the part the reference's
  *    shard tracker implements): a child shard must not be consumed until
  *    its parent is fully drained.
  *
  * Like [[InMemoryTxnBroker]], this exists to EXECUTE the protocol in the
  * zero-egress sandbox; a real deployment uses a Kinesis connector (or
  * `Connectors.kinesis`'s format passthrough) against the AWS endpoint.
  */
final class InMemoryKinesis {

  final case class Shard(id: String, hashStart: BigInt, hashEnd: BigInt,
                         parent: Option[String]) {
    val records = scala.collection.mutable.ArrayBuffer.empty[String]
    var closed: Boolean = false
  }

  private val streams =
    scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.LinkedHashMap[String, Shard]]
  private var shardSeq = 0

  private def maxHash = BigInt(1) << 128

  def createStream(name: String, shards: Int): Unit = synchronized {
    require(!streams.contains(name), s"stream $name exists")
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Shard]
    val width = maxHash / shards
    (0 until shards).foreach { i =>
      val id = nextShardId()
      m(id) = Shard(id, width * i,
        if (i == shards - 1) maxHash - 1 else width * (i + 1) - 1, None)
    }
    streams(name) = m
    ()
  }

  private def nextShardId(): String = {
    val id = f"shardId-$shardSeq%012d"
    shardSeq += 1
    id
  }

  private def md5Hash(key: String): BigInt = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    BigInt(1, d)
  }

  /** Route by md5(partitionKey) into the OPEN shard owning that hash —
    * the PutRecord contract. Returns (shardId, sequenceNumber).
    */
  def putRecord(stream: String, partitionKey: String, data: String): (String, Long) =
    synchronized {
      val h = md5Hash(partitionKey)
      val shard = streams(stream).values
        .find(s => !s.closed && h >= s.hashStart && h <= s.hashEnd)
        .getOrElse(throw new IllegalStateException(
          s"no open shard covers hash of '$partitionKey'"))
      shard.records += data
      (shard.id, shard.records.size - 1L)
    }

  /** ListShards: (shardId, parentShardId, closed). */
  def listShards(stream: String): Seq[(String, Option[String], Boolean)] =
    synchronized {
      streams(stream).values.map(s => (s.id, s.parent, s.closed)).toSeq
    }

  /** Exclusive end sequence of a shard's log. */
  def endSequence(stream: String, shardId: String): Long = synchronized {
    streams(stream)(shardId).records.size.toLong
  }

  def isClosed(stream: String, shardId: String): Boolean = synchronized {
    streams(stream)(shardId).closed
  }

  /** GetRecords over [from, until) of one shard (iterator positions
    * collapsed to sequence numbers — stable, replayable).
    */
  def getRecords(stream: String, shardId: String, from: Long, until: Long): Seq[String] =
    synchronized {
      val log = streams(stream)(shardId).records
      log.slice(math.min(from, log.size.toLong).toInt,
        math.min(until, log.size.toLong).toInt).toIndexedSeq // O(1) access
    }

  /** SplitShard: close the parent, open two children over its halved hash
    * range. Records already in the parent stay readable there (consumers
    * drain parents before children); new puts route to the children.
    */
  def splitShard(stream: String, shardId: String): (String, String) = synchronized {
    val s = streams(stream)(shardId)
    require(!s.closed, s"shard $shardId already closed")
    s.closed = true
    val mid = (s.hashStart + s.hashEnd) / 2
    val c1 = Shard(nextShardId(), s.hashStart, mid, Some(s.id))
    val c2 = Shard(nextShardId(), mid + 1, s.hashEnd, Some(s.id))
    streams(stream)(c1.id) = c1
    streams(stream)(c2.id) = c2
    (c1.id, c2.id)
  }
}

object InMemoryKinesis {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryKinesis]()
  def named(name: String): InMemoryKinesis =
    registry.computeIfAbsent(name, _ => new InMemoryKinesis)
}
