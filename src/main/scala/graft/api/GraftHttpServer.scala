package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.core.{AttrField, CollectionConfig}
import graft.operators.DocFilter

/** Network service surface: a JSON-over-HTTP listener wrapping
  * [[GraftService]], mirroring the reference's gRPC routes
  * (rs/proto/proto/muopdb.proto; handlers
  * rs/index_server/src/index_server.rs:171-527) — one route per RPC, same
  * request/response field names as the proto, uuid string ids. Built on
  * the JDK's HttpServer so the engine stays dependency-free; a gRPC
  * binding would be a drop-in layer over the same [[GraftService]] calls.
  *
  * Routes (all POST JSON unless noted):
  *  - `POST /create_collection`  {name, num_features, ...}
  *  - `POST /insert`             {collection_name, doc_ids, user_ids, vectors, attributes?}
  *  - `POST /flush`              {collection_name}
  *  - `POST /search`             {collection_name, vector, top_k?, user_ids?,
  *                                num_explored_centroids?, centroid_distance_ratio?,
  *                                filter?: filter tree (below)}
  *  - `POST /term_search`        {collection_name, filter, limit?, user_ids?}
  *  - `POST /serve_search`       {collection_name, user_ids: [uuid], vector,
  *                                top_k?, nprobe?, filter?} — zero-Spark-jobs
  *  - `POST /serve_term_search`  {collection_name, user_ids: [uuid], filter,
  *                                limit?} — zero-Spark-jobs
  *  - `POST /remove`             {collection_name, user_ids, doc_ids}
  *  - `GET  /segments?collection=<name>`
  *
  * Filter trees mirror the proto's DocumentFilter (muopdb.proto:83-114):
  * a Contains leaf `{field, value, keyword?}`, plus `{and: [...]}`,
  * `{or: [...]}`, `{not_contains: {field, value, keyword?}}`, and
  * `{ids: [1, 2, ...]}`.
  */
final class GraftHttpServer(svc: GraftService, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound port (useful with port = 0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handle(ex: HttpExchange)(f: => Any): Unit =
    try respond(ex, 200, Json.write(f))
    catch {
      case e: Throwable =>
        respond(ex, 400, Json.write(Map("error" -> String.valueOf(e.getMessage))))
    }

  private def readBody(ex: HttpExchange): Map[String, Any] =
    Json.obj(Json.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)))

  server.createContext("/create_collection", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val schema = b.get("attribute_schema").map { v =>
      v.asInstanceOf[Vector[Any]].map { f =>
        val m = Json.obj(f)
        AttrField(
          m("name").asInstanceOf[String],
          m.getOrElse("kind", "text").asInstanceOf[String],
          m.getOrElse("lang", "english").asInstanceOf[String])
      }
    }.getOrElse(Vector.empty)
    svc.createCollection(CollectionConfig(
      name = b("name").asInstanceOf[String],
      numFeatures = b("num_features").asInstanceOf[Double].toInt,
      initialNumCentroids =
        b.getOrElse("initial_num_centroids", 10.0).asInstanceOf[Double].toInt,
      attributeSchema = schema))
    Map("created" -> b("name"))
  })

  server.createContext("/insert", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val attrs = b.get("attributes").map(Json.obj).getOrElse(Map.empty)
      .map { case (k, v) => k -> Json.strs(v) }
    val n = svc.insert(InsertRequest(
      b("collection_name").asInstanceOf[String],
      docIds = Json.strs(b("doc_ids")),
      userIds = Json.strs(b("user_ids")),
      vectors = Json.doubles(b("vectors")).map(_.toFloat),
      attributes = attrs))
    Map("inserted" -> n)
  })

  server.createContext("/flush", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    Map("flushed_segment" ->
      svc.flush(b("collection_name").asInstanceOf[String]).orNull)
  })

  /** Recursive DocumentFilter tree from JSON — the full reference proto
    * surface (muopdb.proto:83-114): `{and:[...]}`, `{or:[...]}`,
    * `{not_contains:{field,value,keyword?}}`, `{ids:[...]}`, and the
    * bare `{field, value, keyword?}` Contains leaf (also the historic
    * single-leaf format, so existing clients keep working). */
  private def parseFilter(v: Any): DocFilter = {
    val m = Json.obj(v)
    if (m.contains("and"))
      DocFilter.And(m("and").asInstanceOf[Vector[Any]].map(parseFilter))
    else if (m.contains("or"))
      DocFilter.Or(m("or").asInstanceOf[Vector[Any]].map(parseFilter))
    else if (m.contains("not_contains")) {
      val c = Json.obj(m("not_contains"))
      DocFilter.NotContains(
        c("field").asInstanceOf[String],
        c("value").asInstanceOf[String],
        c.getOrElse("keyword", false).asInstanceOf[Boolean])
    } else if (m.contains("ids"))
      DocFilter.Ids(Json.doubles(m("ids")).map(_.toLong))
    else
      DocFilter.Contains(
        m("field").asInstanceOf[String],
        m("value").asInstanceOf[String],
        m.getOrElse("keyword", false).asInstanceOf[Boolean])
  }

  server.createContext("/search", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val filter = b.get("filter").map(parseFilter)
    val res = svc.search(SearchRequest(
      b("collection_name").asInstanceOf[String],
      vector = Json.doubles(b("vector")).map(_.toFloat),
      topK = b.getOrElse("top_k", 10.0).asInstanceOf[Double].toInt,
      userIds = b.get("user_ids").map(Json.strs).getOrElse(Nil),
      filter = filter,
      numExploredCentroids =
        b.get("num_explored_centroids").map(_.asInstanceOf[Double].toInt),
      centroidDistanceRatio =
        b.getOrElse("centroid_distance_ratio", 0.1).asInstanceOf[Double]))
    Map("doc_ids" -> res.docIds, "scores" -> res.scores)
  })

  server.createContext("/term_search", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val docIds = svc.termSearch(
      b("collection_name").asInstanceOf[String],
      parseFilter(b("filter")),
      limit = b.getOrElse("limit", 10.0).asInstanceOf[Double].toInt,
      userIds = b.get("user_ids").map(Json.strs).getOrElse(Nil))
    Map("doc_ids" -> docIds)
  })

  // Served (zero-Spark-jobs) per-user query paths — the reference's main
  // serving posture (per-user in-memory indexes, collection_manager.rs:
  // 27-94). The view is cached per (collection, user) keyed on the
  // collection state fingerprint, so repeated calls answer at in-memory
  // latency; any write transparently rebuilds on next call.
  server.createContext("/serve_search", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val res = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        Json.strs(b("user_ids")).head)
      .search(Json.doubles(b("vector")).map(_.toFloat),
        topK = b.getOrElse("top_k", 10.0).asInstanceOf[Double].toInt,
        nprobe = b.getOrElse("nprobe", 10.0).asInstanceOf[Double].toInt,
        filter = b.get("filter").map(parseFilter))
    Map("doc_ids" -> res.docIds, "scores" -> res.scores)
  })

  server.createContext("/serve_term_search", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val docIds = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        Json.strs(b("user_ids")).head)
      .termSearch(parseFilter(b("filter")),
        limit = b.getOrElse("limit", 10.0).asInstanceOf[Double].toInt)
    Map("doc_ids" -> docIds)
  })

  server.createContext("/remove", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    svc.remove(
      b("collection_name").asInstanceOf[String],
      Json.strs(b("user_ids")),
      Json.strs(b("doc_ids")))
    Map("removed" -> true)
  })

  server.createContext("/segments", (ex: HttpExchange) => handle(ex) {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val name = q.split("&").collectFirst {
      case kv if kv.startsWith("collection=") => kv.stripPrefix("collection=")
    }.getOrElse(sys.error("missing collection query param"))
    Map("segments" -> svc.getSegments(name))
  })

  def start(): GraftHttpServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
