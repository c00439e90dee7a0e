package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LIVE-ENDPOINT integration specs (VERDICT r11 item 3): the protocol layers
  * exercised in-sandbox against stubs (ElasticShapedSpec,
  * KinesisShapedSourceSpec, KafkaShapedSourceSpec) re-run their data
  * assertions against REAL endpoints when the environment provides them:
  *
  *   - `ES_URL`          → a reachable Elasticsearch-compatible REST endpoint
  *   - `AWS_ENDPOINT`    → a Kinesis-compatible endpoint (real AWS or
  *                         localstack), plus AWS_ACCESS_KEY_ID /
  *                         AWS_SECRET_ACCESS_KEY (and optionally
  *                         AWS_SESSION_TOKEN, AWS_REGION)
  *   - `KAFKA_BOOTSTRAP` → a Kafka broker; ALSO requires kafka-clients on the
  *                         test classpath (the Kafka binary protocol is not
  *                         re-implemented here) — driven via reflection so
  *                         this repo keeps zero extra dependencies
  *
  * When a variable is unset the test CANCELS with a loud
  * "LIVE WIRE UNTESTED HERE" marker — a canceled test is reported as
  * canceled, never as a pass, so the suite cannot silently claim live
  * coverage it did not run. In the zero-egress build sandbox every test
  * here cancels by design; the stub-backed specs remain the in-sandbox gate.
  */
class LiveWireSpec extends SparkSpec {

  private def env(name: String): Option[String] =
    sys.env.get(name).map(_.trim).filter(_.nonEmpty)

  private def needs(name: String): String = {
    assume(env(name).isDefined,
      s"LIVE WIRE UNTESTED HERE: set $name to run this against a real endpoint")
    env(name).get
  }

  test("live Elasticsearch: bulk sink indexes every row; sliced scroll reads them back") {
    val ep = needs("ES_URL")
    import spark.implicits._
    val index = s"graft_live_${System.nanoTime()}"
    val df = (1 to 257).map(i => (s"d$i", s"""{"v":$i}""")).toDF("id", "doc")
    ElasticShaped.SinkBuilder(ep, index, bulkSize = 50).write(df)

    // unsliced read: complete and exact (same assertion as the stub spec)
    val back = ElasticShaped.SourceBuilder(ep, index, pageSize = 40).build(spark)
    val vals = back.select(get_json_object($"doc", "$.v").cast("int").as("v"))
      .as[Int].collect().sorted
    assert(vals.toSeq == (1 to 257))

    // sliced read: disjoint + complete across one partition per slice
    val sliced = ElasticShaped.SourceBuilder(ep, index)
      .enableSlicing().withSlices(5).withPageSize(37).build(spark)
    assert(sliced.rdd.getNumPartitions == 5)
    val ids = sliced.select("id").collect().map(_.getString(0))
    assert(ids.length == 257 && ids.toSet.size == 257,
      "slices must cover every doc exactly once")
  }

  test("live Kinesis: records route by partition-key hash across shards and read back exactly") {
    val ep = needs("AWS_ENDPOINT")
    val creds = SigV4.Credentials(
      needs("AWS_ACCESS_KEY_ID"), needs("AWS_SECRET_ACCESS_KEY"),
      env("AWS_SESSION_TOKEN"))
    val region = env("AWS_REGION").getOrElse("us-east-1")
    val k = new KinesisWire(ep, region, creds)
    val stream = s"graft-live-${System.nanoTime()}"
    k.createStream(stream, shards = 2)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (k.streamStatus(stream) != "ACTIVE" && System.nanoTime() < deadline)
      Thread.sleep(500)
    assert(k.streamStatus(stream) == "ACTIVE", "stream must become ACTIVE")

    val payloads = (1 to 100).map(i => s"rec-$i")
    payloads.foreach(p => k.putRecord(stream, p, p))
    val shards = k.listShards(stream)
    assert(shards.size == 2, s"expected 2 shards, got $shards")
    val perShard = shards.map(sh => sh -> k.readShard(stream, sh))
    // same data assertions as the stub spec: union exact, both shards used
    val all = perShard.flatMap(_._2)
    assert(all.sorted == payloads.sorted, "every record read back exactly once")
    assert(perShard.count(_._2.nonEmpty) == 2,
      "md5 hash-range routing must spread keys across both shards")
  }

  test("live Kafka: binary-protocol produce/fetch roundtrip (in-repo wire client, zero extra jars)") {
    val bootstrap = needs("KAFKA_BOOTSTRAP")
    val k = new KafkaWire(bootstrap)
    try {
      // the client negotiates per broker (r13): each API needs EITHER its
      // non-flexible version or its flexible (compact) version in range
      val versions = k.apiVersions()
      for ((api, legacy, flex) <- Seq((0, 3, 9), (1, 4, 12), (3, 4, 9), (2, 2, 6))) {
        val (min, max) = versions.getOrElse(api,
          fail(s"broker does not list api $api"))
        assume((min <= legacy && legacy <= max) || (min <= flex && flex <= max),
          s"LIVE WIRE UNTESTED HERE: broker supports api $api only [$min,$max], " +
            s"this client speaks v$legacy (pre-KIP-482) or v$flex (flexible)")
      }
      val topic = s"graft-live-${System.nanoTime()}"
      val payloads = (1 to 100).map(i => s"msg-$i")
      val parts = k.topicMetadata(topic).map(_.partition)
      assert(parts.nonEmpty, s"topic $topic must auto-create")
      // spread records across the topic's partitions, remembering the split
      val byPartition = payloads.zipWithIndex
        .groupMap { case (_, i) => parts(i % parts.size) } { case (p, _) => p }
      byPartition.foreach { case (partition, msgs) =>
        val base = k.produce(topic, partition,
          msgs.map(m => (m.getBytes("UTF-8"), m.getBytes("UTF-8"))))
        assert(base >= 0L)
        // ListOffsets: latest (-1) must equal base + produced count,
        // earliest (-2) must be 0 on a fresh topic
        assert(k.listOffset(topic, partition, -1L) == base + msgs.size,
          "log-end offset after produce")
        assert(k.listOffset(topic, partition, -2L) == 0L,
          "log-start offset of a fresh topic")
      }
      // read everything back under read_committed, per partition from 0
      val got = byPartition.keys.toSeq.flatMap { partition =>
        var offset = 0L
        val acc = Seq.newBuilder[String]
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        var hw = Long.MaxValue
        while (offset < hw && System.nanoTime() < deadline) {
          val (records, highWatermark) = k.fetch(topic, partition, offset)
          hw = highWatermark
          records.foreach { case (o, key, value) =>
            assert(new String(key, "UTF-8") == new String(value, "UTF-8"))
            acc += new String(value, "UTF-8")
            offset = math.max(offset, o + 1)
          }
          if (records.isEmpty && offset < hw) Thread.sleep(100)
        }
        acc.result()
      }
      assert(got.sorted == payloads.sorted,
        "every produced record fetched exactly once under read_committed")
    } finally k.close()
  }

  test("live Kafka SASL: authenticated produce/fetch through the in-repo PLAIN/SCRAM client") {
    // scripts/livewire.sh exports these for its SASL_PLAINTEXT listener on
    // :9094 (SCRAM-SHA-256 user created via kafka-configs); any broker with
    // a SASL listener works the same — TLS composes via KAFKA_SASL_TLS=1
    // (+ KAFKA_SASL_TLS_INSECURE=1 for self-signed test certs)
    val bootstrap = needs("KAFKA_SASL_BOOTSTRAP")
    val user = needs("KAFKA_SASL_USER")
    val password = needs("KAFKA_SASL_PASSWORD")
    val mech = env("KAFKA_SASL_MECHANISM").getOrElse("SCRAM-SHA-256")
    val security = KafkaSecurity(
      tls = env("KAFKA_SASL_TLS").isDefined,
      tlsInsecure = env("KAFKA_SASL_TLS_INSECURE").isDefined,
      saslMechanism = Some(mech), username = user, password = password)
    val k = new KafkaWire(bootstrap, security = security)
    try {
      val topic = s"graft-sasl-${System.nanoTime()}"
      val payloads = (1 to 50).map(i => s"auth-msg-$i")
      val partition = k.topicMetadata(topic).map(_.partition).head
      val base = k.produce(topic, partition,
        payloads.map(m => (m.getBytes("UTF-8"), m.getBytes("UTF-8"))))
      assert(base >= 0L)
      var offset = 0L
      val acc = Seq.newBuilder[String]
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var hw = Long.MaxValue
      while (offset < hw && System.nanoTime() < deadline) {
        val (records, highWatermark) = k.fetch(topic, partition, offset)
        hw = highWatermark
        records.foreach { case (o, _, value) =>
          acc += new String(value, "UTF-8")
          offset = math.max(offset, o + 1)
        }
        if (records.isEmpty && offset < hw) Thread.sleep(100)
      }
      assert(acc.result().sorted == payloads.sorted,
        "authenticated produce/fetch must round-trip every record")
    } finally k.close()
  }
}
