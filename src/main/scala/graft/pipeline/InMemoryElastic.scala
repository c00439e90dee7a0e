package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** In-process Elasticsearch-shaped service speaking the actual REST subset the
  * reference connector drives (extensions/elasticsearch/elasticsearch-7/.../
  * ElasticSourceP.java: sliced scroll search; ElasticSinkBuilder.java: _bulk
  * with retry): real HTTP on a loopback port, JSON bodies, scroll contexts,
  * slice routing, bulk indexing with injectable 429 failures.
  *
  * Like `InMemoryKinesis`/`InMemoryTxnBroker`, this exists because the sandbox
  * has zero egress: the PROTOCOL (wire format, paging, slicing, error
  * contract) is exercised for real; only the remote cluster is stubbed. Slice
  * membership uses floorMod(hash(_id), max) == id — ES's documented
  * disjoint-and-complete contract for sliced scroll.
  */
final class InMemoryElastic {
  private val mapper = new ObjectMapper()
  // index -> docId -> source json string; insertion-ordered per index for
  // deterministic scroll order within a slice
  private val indexes = new TrieMap[String, java.util.LinkedHashMap[String, String]]
  private final case class Scroll(docs: Vector[(String, String)], var pos: Int, size: Int)
  private val scrolls = new ConcurrentHashMap[String, Scroll]
  private val scrollCounter = new AtomicLong()
  /** fail-injection: next N _bulk or _search requests answer 429 */
  val failNextBulk = new AtomicInteger(0)
  val failNextSearch = new AtomicInteger(0)
  val bulkRequests = new AtomicLong(0)
  val searchRequests = new AtomicLong(0)

  private var server: HttpServer = _
  private var pool: java.util.concurrent.ExecutorService = _

  def start(): String = synchronized {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    // daemon threads: HttpServer.stop() does NOT shut down a caller-supplied
    // executor, and a non-daemon pool would pin the JVM open after main()
    // returns (it hung graft.Verify for 15 minutes before this was caught)
    pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
      val t = new Thread(r, "elastic-stub"); t.setDaemon(true); t
    })
    server.setExecutor(pool)
    server.start()
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
    if (pool != null) { pool.shutdownNow(); pool = null }
  }

  def docCount(index: String): Int =
    indexes.get(index).map(m => m.synchronized(m.size)).getOrElse(0)

  def activeScrolls: Int = scrolls.size

  def indexDoc(index: String, id: String, source: String): Unit = {
    val m = indexes.getOrElseUpdate(index, new java.util.LinkedHashMap[String, String])
    m.synchronized { m.put(id, source); () }
  }

  // ------------------------------------------------------------- http plumbing

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/")
      val method = ex.getRequestMethod
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val segs = path.split("/").filter(_.nonEmpty).toList
      (method, segs) match {
        case ("POST", "_bulk" :: Nil)                      => bulk(ex, body)
        case ("POST", "_search" :: "scroll" :: Nil)        => scrollNext(ex, body)
        case ("DELETE", "_search" :: "scroll" :: Nil)      => scrollClear(ex, body)
        case ("POST", idx :: "_search" :: Nil)             => search(ex, idx, body)
        case ("GET", idx :: "_count" :: Nil)               => count(ex, idx)
        case ("PUT", idx :: Nil)                           =>
          indexes.getOrElseUpdate(idx, new java.util.LinkedHashMap[String, String])
          reply(ex, 200, """{"acknowledged":true}""")
        case ("PUT", idx :: "_doc" :: id :: Nil) =>
          indexDoc(idx, id, body)
          reply(ex, 201, s"""{"_index":"$idx","_id":"$id","result":"created"}""")
        case _ => reply(ex, 400, s"""{"error":"unsupported ${method} /${path}"}""")
      }
    } catch {
      case e: Exception =>
        reply(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""")
    } finally ex.close()

  private def reply(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  // --------------------------------------------------------------- operations

  /** `GET /{index}/_count`. */
  private def count(ex: HttpExchange, index: String): Unit =
    reply(ex, 200, s"""{"count":${docCount(index)}}""")

  /** `POST /{index}/_search?scroll=...` with optional body `slice:{id,max}`
    * and `size` — opens a scroll context over this slice's documents.
    */
  private def search(ex: HttpExchange, index: String, body: String): Unit = {
    searchRequests.incrementAndGet()
    if (failNextSearch.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      reply(ex, 429, """{"error":"rejected_execution_exception"}"""); return
    }
    val node = if (body.isEmpty) mapper.createObjectNode() else mapper.readTree(body)
    val size = if (node.has("size")) node.get("size").asInt() else 10
    val (sliceId, sliceMax) =
      if (node.has("slice"))
        (node.get("slice").get("id").asInt(), node.get("slice").get("max").asInt())
      else (0, 1)
    val all = indexes.get(index) match {
      case Some(m) => m.synchronized(m.asScala.toVector)
      case None    => reply(ex, 404, s"""{"error":"no such index $index"}"""); return
    }
    val mine = all.filter { case (id, _) =>
      math.floorMod(id.hashCode, sliceMax) == sliceId
    }
    val scrollId = s"scroll-${scrollCounter.incrementAndGet()}"
    val ctx = Scroll(mine, 0, size)
    scrolls.put(scrollId, ctx)
    reply(ex, 200, page(scrollId, ctx, index))
  }

  /** `POST /_search/scroll` — next page of an open context. */
  private def scrollNext(ex: HttpExchange, body: String): Unit = {
    val node = mapper.readTree(body)
    val scrollId = node.get("scroll_id").asText()
    val ctx = scrolls.get(scrollId)
    if (ctx == null) { reply(ex, 404, """{"error":"no such scroll"}"""); return }
    reply(ex, 200, page(scrollId, ctx, null))
  }

  /** `DELETE /_search/scroll`. */
  private def scrollClear(ex: HttpExchange, body: String): Unit = {
    val node = mapper.readTree(body)
    val ids = node.get("scroll_id")
    val toClear =
      if (ids.isArray) ids.asInstanceOf[ArrayNode].asScala.map(_.asText()).toSeq
      else Seq(ids.asText())
    toClear.foreach(scrolls.remove)
    reply(ex, 200, """{"succeeded":true}""")
  }

  private def page(scrollId: String, ctx: Scroll, index: String): String =
    ctx.synchronized {
      val slice = ctx.docs.slice(ctx.pos, ctx.pos + ctx.size)
      ctx.pos += slice.size
      val root = mapper.createObjectNode()
      root.put("_scroll_id", scrollId)
      val hitsOuter = root.putObject("hits")
      hitsOuter.putObject("total").put("value", ctx.docs.size).put("relation", "eq")
      val arr = hitsOuter.putArray("hits")
      for ((id, src) <- slice) {
        val h = arr.addObject()
        h.put("_id", id)
        h.set[ObjectNode]("_source", mapper.readTree(src))
      }
      mapper.writeValueAsString(root)
    }

  /** `POST /_bulk` — NDJSON pairs of action + source, index actions only;
    * per-item results, top-level `errors` flag (ElasticSinkBuilder checks it).
    */
  private def bulk(ex: HttpExchange, body: String): Unit = {
    bulkRequests.incrementAndGet()
    if (failNextBulk.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      reply(ex, 429, """{"error":"rejected_execution_exception"}"""); return
    }
    val lines = body.split("\n").filter(_.trim.nonEmpty)
    val results = mapper.createArrayNode()
    var i = 0
    while (i < lines.length) {
      val action = mapper.readTree(lines(i))
      if (action.has("index")) {
        require(i + 1 < lines.length, "bulk action without source line")
        val meta = action.get("index")
        val idx = meta.get("_index").asText()
        val id =
          if (meta.has("_id")) meta.get("_id").asText()
          else java.util.UUID.randomUUID().toString
        indexDoc(idx, id, lines(i + 1))
        val r = results.addObject().putObject("index")
        r.put("_index", idx).put("_id", id).put("status", 201)
        i += 2
      } else {
        i += 1 // unsupported action type: skip its line
      }
    }
    val root = mapper.createObjectNode()
    root.put("took", 1)
    root.put("errors", false)
    root.set[JsonNode]("items", results)
    reply(ex, 200, mapper.writeValueAsString(root))
  }
}

/** Process-wide registry so Spark tasks (same JVM in local mode) can resolve a
  * running stub by name — the pattern `InMemoryKinesis`/`KeyedStore` use.
  */
object InMemoryElastic {
  private val services = new TrieMap[String, InMemoryElastic]

  def create(name: String): (InMemoryElastic, String) = {
    val svc = new InMemoryElastic
    val endpoint = svc.start()
    services.put(name, svc)
    (svc, endpoint)
  }

  def get(name: String): Option[InMemoryElastic] = services.get(name)

  def drop(name: String): Unit = services.remove(name).foreach(_.stop())
}
