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

  test("live Kafka: produce/consume roundtrip through a real broker (kafka-clients via reflection)") {
    val bootstrap = needs("KAFKA_BOOTSTRAP")
    val producerCls =
      try Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
      catch {
        case _: ClassNotFoundException =>
          cancel("LIVE WIRE UNTESTED HERE: KAFKA_BOOTSTRAP is set but " +
            "kafka-clients is not on the test classpath — add it in the live CI")
      }
    val topic = s"graft-live-${System.nanoTime()}"
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrap)
    props.put("key.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    props.put("value.serializer", "org.apache.kafka.common.serialization.StringSerializer")
    val producer = producerCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props).asInstanceOf[AutoCloseable]
    val recordCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val send = producerCls.getMethod("send", recordCls)
    val payloads = (1 to 100).map(i => s"msg-$i")
    try payloads.foreach { p =>
      val rec = recordCls
        .getConstructor(classOf[String], classOf[Object], classOf[Object])
        .newInstance(topic, p, p)
      send.invoke(producer, rec.asInstanceOf[Object])
    } finally producer.close()

    val cprops = new java.util.Properties()
    cprops.put("bootstrap.servers", bootstrap)
    cprops.put("group.id", s"$topic-reader")
    cprops.put("auto.offset.reset", "earliest")
    cprops.put("isolation.level", "read_committed") // the EOS consumer mode the stub spec pins
    cprops.put("key.deserializer", "org.apache.kafka.common.serialization.StringDeserializer")
    cprops.put("value.deserializer", "org.apache.kafka.common.serialization.StringDeserializer")
    val consumerCls = Class.forName("org.apache.kafka.clients.consumer.KafkaConsumer")
    val consumer = consumerCls.getConstructor(classOf[java.util.Properties])
      .newInstance(cprops).asInstanceOf[AutoCloseable]
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      consumerCls.getMethod("subscribe", classOf[java.util.Collection[_]])
        .invoke(consumer, java.util.List.of(topic))
      val poll = consumerCls.getMethod("poll", classOf[java.time.Duration])
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (got.size < payloads.size && System.nanoTime() < deadline) {
        val records = poll.invoke(consumer, java.time.Duration.ofMillis(500))
        val it = records.getClass.getMethod("iterator").invoke(records)
          .asInstanceOf[java.util.Iterator[AnyRef]]
        while (it.hasNext) {
          val r = it.next()
          got += r.getClass.getMethod("value").invoke(r).asInstanceOf[String]
        }
      }
    } finally consumer.close()
    assert(got.sorted.toSeq == payloads.sorted,
      "every produced record consumed exactly once under read_committed")
  }
}
