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
  *  - `POST /insert_packed`      {collection_name, doc_ids: b64 u128-LE,
  *                                vectors: b64 f32-LE, user_ids}
  *  - `POST /flush`              {collection_name}
  *  - `POST /search`             {collection_name, vector, top_k?, user_ids?,
  *                                num_explored_centroids?, centroid_distance_ratio?,
  *                                target_recall? (calibrated probing),
  *                                filter?: filter tree (below)}
  *  - `POST /term_search`        {collection_name, filter, limit?, user_ids?}
  *  - `POST /facets`             {collection_name, filter, field, k?,
  *                                user_ids?} — facet counts over the match
  *  - `POST /term_stats`         {collection_name, prefix?, k?, user_ids?}
  *                                — term dictionary with doc frequencies
  *  - `POST /facet_ranges`       {collection_name, filter, field,
  *                                buckets: [[lo, hi], ...]} — numeric
  *                                histogram over the match
  *  - `POST /suggest`            {collection_name, field, input, k?,
  *                                max_dist?} — "did you mean" over the
  *                                live term dictionary
  *  - `POST /rank`               {collection_name, field | fields: {name:
  *                                weight}, query, k?, user_ids?, filter?} —
  *                                BM25-ranked text retrieval over the
  *                                persisted term index; `filter` is filter
  *                                context (restricts results, never scores)
  *  - `POST /hybrid_rank`        {collection_name, field, query, vector,
  *                                k?, window?, nprobe?, user_ids?, filter?}
  *                                — RRF fusion of the BM25 and ANN lists
  *  - `POST /more_like_this`     {collection_name, field, user_id, doc_id,
  *                                m?, k?, filter?} — seed-profiled BM25
  *                                retrieval, seed excluded
  *  - `POST /calibrate`          {collection_name, k?, n_queries?, ladder?}
  *                                — measure + persist the recall curve
  *                                `target_recall` searches resolve against
  *  - `POST /serve_search`       {collection_name, user_ids: [uuid], vector,
  *                                top_k?, nprobe?, filter?} — zero-Spark-jobs
  *  - `POST /serve_term_search`  {collection_name, user_ids: [uuid], filter,
  *                                limit?} — zero-Spark-jobs
  *  - `POST /serve_facets`       {collection_name, user_ids: [uuid], filter,
  *                                field, k?} — zero-Spark-jobs
  *  - `POST /serve_term_stats`   {collection_name, user_ids: [uuid],
  *                                prefix?, k?} — zero-Spark-jobs
  *  - `POST /serve_facet_ranges` {collection_name, user_ids: [uuid], filter,
  *                                field, buckets} — zero-Spark-jobs
  *  - `POST /serve_suggest`      {collection_name, user_ids: [uuid], field,
  *                                input, k?, max_dist?} — zero-Spark-jobs
  *  - `POST /serve_rank`         {collection_name, user_ids: [uuid], field |
  *                                fields, query, k?, filter?} —
  *                                zero-Spark-jobs BM25
  *  - `POST /serve_hybrid_rank`  {collection_name, user_ids: [uuid], field,
  *                                query, vector, k?, window?, nprobe?,
  *                                filter?} — zero-Spark-jobs RRF hybrid
  *  - `POST /serve_more_like_this` {collection_name, user_ids: [uuid],
  *                                field, doc_id, m?, k?, filter?} —
  *                                zero-Spark-jobs
  *  - `POST /remove`             {collection_name, user_ids, doc_ids}
  *  - `GET  /segments?collection=<name>`
  *  - `POST /optimize`           {collection_name} — one compaction tick
  *  - `POST /backup`             {collection_name, dest_base, version?}
  *
  * Filter trees mirror the proto's DocumentFilter (muopdb.proto:83-114):
  * a Contains leaf `{field, value, keyword?}`, plus `{and: [...]}`,
  * `{or: [...]}`, `{not_contains: {field, value, keyword?}}`, and
  * `{ids: [1, 2, ...]}`; beyond-proto positional extensions
  * `{phrase: {field, value}}` (consecutive analyzed tokens) and
  * `{near: {field, left, right, window}}` (unordered proximity), plus
  * dictionary multi-term queries `{prefix: {field, value}}` (unanalyzed
  * fragment), `{fuzzy: {field, value, max_dist?}}` (Levenshtein),
  * `{regexp: {field, value}}` (anchored full-token, Java syntax),
  * `{wildcard: {field, value}}` (`*`/`?` globs) and
  * `{range: {field, gte?, lte?}}` (numeric attributes, inclusive).
  *
  * Every route ALSO accepts the exact protobuf-JSON request shape of the
  * corresponding muopdb.proto message — the README Quick Start payloads
  * verbatim (ids as `{uuid}`/`{low_id, high_id}` objects, SearchParams
  * nested under `params`, the filter under `where_document` with
  * `{contains: {path, value}}` leaves, attributes as a
  * DocumentAttributeList) — and then answers with the proto response
  * message shape (ProtoConformanceSpec pins the parity field by field),
  * so a gRPC binding is a transport swap, not a re-mapping. */
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

  // ---- proto-JSON interop (muopdb.proto via the protobuf JSON mapping,
  // the exact payloads of the reference README Quick Start) -------------
  // Every route accepts BOTH the repo's legacy flat shape and the proto
  // shape; responses mirror the proto response message whenever the
  // request used proto conventions, so the future gRPC binding is a
  // mechanical transport swap over the same GraftService calls.

  /** proto uint64 in JSON may arrive as a number or a string. Numbers go
    * through BigDecimal — Double.toLong would saturate values >= 2^63 to
    * Long.MaxValue and silently target the wrong id. */
  private def u64(v: Any): java.math.BigInteger = v match {
    case s: String => new java.math.BigInteger(s)
    case d: Double => new java.math.BigDecimal(d).toBigInteger
    case other => new java.math.BigInteger(String.valueOf(other))
  }

  /** proto Id {uuid} | {low_id, high_id} (muopdb.proto:72-81) -> uuid. */
  private def idToUuid(m: Map[String, Any]): String =
    m.get("uuid") match {
      case Some(u: String) => u
      case _ =>
        val hi = m.get("high_id").map(u64).getOrElse(java.math.BigInteger.ZERO)
        val lo = m.get("low_id").map(u64).getOrElse(java.math.BigInteger.ZERO)
        val h = f"${hi.longValue()}%016x${lo.longValue()}%016x"
        s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
          s"${h.substring(16, 20)}-${h.substring(20, 32)}"
    }

  /** id list: legacy uuid strings or proto Id objects. */
  private def parseIds(v: Any): Seq[String] =
    v.asInstanceOf[Vector[Any]].map {
      case s: String => s
      case m => idToUuid(Json.obj(m))
    }

  private def isProtoIds(v: Any): Boolean =
    v.asInstanceOf[Vector[Any]].headOption.exists(_.isInstanceOf[Map[_, _]])

  private def idsOut(ids: Seq[String], proto: Boolean): Any =
    if (proto) ids.map(u => Map("uuid" -> u)) else ids

  /** proto AttributeType enum -> the engine's attribute kind. */
  private def attrKind(t: String): String = t match {
    case "ATTRIBUTE_TYPE_TEXT" => "text"
    case "ATTRIBUTE_TYPE_KEYWORD" => "keyword"
    case "ATTRIBUTE_TYPE_INT" => "int"
    case "ATTRIBUTE_TYPE_FLOAT" => "float"
    case "ATTRIBUTE_TYPE_BOOL" => "bool"
    case other => other.toLowerCase
  }

  /** proto AttributeValue {text_value|int_value|float_value|bool_value}
    * -> string (the engine's columnar edge type). */
  private def attrValue(v: Any): String = {
    val m = Json.obj(v)
    m.get("text_value").orElse(m.get("keyword_value")) match {
      case Some(s: String) => s
      case _ => m.get("int_value").map {
          case d: Double => d.toLong.toString
          case s => String.valueOf(s)
        }.orElse(m.get("float_value").map(String.valueOf))
          .orElse(m.get("bool_value").map(String.valueOf))
          .getOrElse(sys.error(s"empty AttributeValue: $v"))
    }
  }

  /** proto DocumentAttributeList {values: [{value: {field: AttributeValue}}]}
    * -> columnar Map[field -> one value per doc] (muopdb.proto:221-228). */
  private def protoAttrs(v: Any, numDocs: Int): Map[String, Seq[String]] = {
    val rows = Json.obj(v)("values").asInstanceOf[Vector[Any]]
      .map(r => Json.obj(Json.obj(r).getOrElse("value", Map.empty[String, Any])))
    require(rows.length == numDocs, s"attributes.values length ${rows.length} != $numDocs docs")
    val fields = rows.flatMap(_.keys).distinct
    fields.map(f => f -> rows.map(r =>
      r.get(f).map(attrValue).getOrElse(""))).toMap
  }

  server.createContext("/create_collection", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    // proto CreateCollectionRequest uses collection_name and a nested
    // {attributes: [{name, type, language}]} schema; the legacy flat
    // shape uses name and [{name, kind, lang}]
    val proto = b.contains("collection_name")
    val name = b.getOrElse("collection_name", b.getOrElse("name", sys.error("missing collection_name")))
      .asInstanceOf[String]
    val schema = b.get("attribute_schema").map { v =>
      val fields = v match {
        case m: Map[_, _] => Json.obj(m)("attributes").asInstanceOf[Vector[Any]]
        case vec => vec.asInstanceOf[Vector[Any]]
      }
      fields.map { f =>
        val m = Json.obj(f)
        AttrField(
          m("name").asInstanceOf[String],
          m.get("type").map(t => attrKind(t.asInstanceOf[String]))
            .getOrElse(m.getOrElse("kind", "text").asInstanceOf[String]),
          m.get("language").orElse(m.get("lang"))
            .getOrElse("english").asInstanceOf[String])
      }
    }.getOrElse(Vector.empty)
    svc.createCollection(CollectionConfig(
      name = name,
      numFeatures = b("num_features").asInstanceOf[Double].toInt,
      initialNumCentroids =
        b.getOrElse("initial_num_centroids", 10.0).asInstanceOf[Double].toInt,
      attributeSchema = schema))
    if (proto) Map("message" -> s"Collection $name created")
    else Map("created" -> name)
  })

  server.createContext("/insert", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val docIds = parseIds(b("doc_ids"))
    val proto = isProtoIds(b("doc_ids")) || isProtoIds(b("user_ids"))
    val attrs = b.get("attributes").map { v =>
      val m = Json.obj(v)
      // proto DocumentAttributeList (row-wise) vs legacy columnar map:
      // decided by STRUCTURE (values elements are {value: {...}} objects),
      // not key name, so a legacy column literally named "values" parses
      val isProtoList = m.get("values").exists {
        case rows: Vector[_] => rows.forall {
          case rm: Map[_, _] => Json.obj(rm).contains("value")
          case _ => false
        }
        case _ => false
      }
      if (isProtoList) protoAttrs(v, docIds.length)
      else m.map { case (k, vv) => k -> Json.strs(vv) }
    }.getOrElse(Map.empty[String, Seq[String]])
    val n = svc.insert(InsertRequest(
      b("collection_name").asInstanceOf[String],
      docIds = docIds,
      userIds = parseIds(b("user_ids")),
      vectors = Json.doubles(b("vectors")).map(_.toFloat),
      attributes = attrs))
    if (proto) Map("num_docs_inserted" -> n) else Map("inserted" -> n)
  })

  // proto InsertPackedRequest (muopdb.proto:199-213): doc_ids = base64 of
  // 16-byte little-endian u128s, vectors = base64 of little-endian f32s
  // (the reference transmutes the byte buffer to &[f32],
  // rs/index_server/src/index_server.rs:589-607)
  server.createContext("/insert_packed", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val rawIds = java.util.Base64.getDecoder.decode(b("doc_ids").asInstanceOf[String])
    require(rawIds.length % 16 == 0, s"doc_ids bytes not a multiple of 16: ${rawIds.length}")
    val docIds = rawIds.grouped(16).map { le =>
      val h = le.reverse.map(x => f"${x & 0xff}%02x").mkString
      s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
        s"${h.substring(16, 20)}-${h.substring(20, 32)}"
    }.toSeq
    val n = svc.insertPacked(InsertPackedRequest(
      b("collection_name").asInstanceOf[String],
      docIds = docIds,
      userIds = parseIds(b("user_ids")),
      packedVectors = java.util.Base64.getDecoder.decode(b("vectors").asInstanceOf[String])))
    Map("num_docs_inserted" -> n)
  })

  server.createContext("/flush", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val seg = svc.flush(b("collection_name").asInstanceOf[String])
    // proto FlushResponse carries the segment list; the legacy scalar key
    // rides along for existing clients
    Map("flushed_segments" -> seg.toSeq, "flushed_segment" -> seg.orNull)
  })

  /** Filter JSON -> DocFilter (shared parser: [[FilterJson]]). */
  private def parseFilter(v: Any): DocFilter = FilterJson.parse(v)

  server.createContext("/search", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    // proto SearchRequest nests SearchParams under "params" and names the
    // filter "where_document" (muopdb.proto:116-131)
    val params = b.get("params").map(Json.obj).getOrElse(Map.empty)
    val proto = b.contains("params") || b.contains("where_document") ||
      b.get("user_ids").exists(isProtoIds)
    def p(key: String): Option[Any] = params.get(key).orElse(b.get(key))
    val filter = b.get("where_document").orElse(b.get("filter")).map(parseFilter)
    val res = svc.search(SearchRequest(
      b("collection_name").asInstanceOf[String],
      vector = Json.doubles(b("vector")).map(_.toFloat),
      topK = p("top_k").map(_.asInstanceOf[Double].toInt).getOrElse(10),
      userIds = b.get("user_ids").map(parseIds).getOrElse(Nil),
      filter = filter,
      numExploredCentroids =
        p("num_explored_centroids").map(_.asInstanceOf[Double].toInt),
      centroidDistanceRatio =
        p("centroid_distance_ratio").map(_.asInstanceOf[Double]).getOrElse(0.1),
      // beyond-proto: calibrated probing (needs a calibrateRecall pass)
      targetRecall = p("target_recall").map(_.asInstanceOf[Double]),
      acceptStaleCalibration = p("accept_stale_calibration")
        .exists(_.asInstanceOf[Boolean])))
    if (proto)
      Map("doc_ids" -> idsOut(res.docIds, proto = true),
        "scores" -> res.scores, "num_pages_accessed" -> 0L)
    else Map("doc_ids" -> res.docIds, "scores" -> res.scores)
  })

  server.createContext("/term_search", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val proto = b.get("user_ids").exists(isProtoIds)
    val docIds = svc.termSearch(
      b("collection_name").asInstanceOf[String],
      parseFilter(b("filter")),
      limit = b.getOrElse("limit", 10.0).asInstanceOf[Double].toInt,
      userIds = b.get("user_ids").map(parseIds).getOrElse(Nil))
    // proto TermSearchResponse carries num_docs alongside the ids
    Map("doc_ids" -> idsOut(docIds, proto), "num_docs" -> docIds.length.toLong)
  })

  // Facet aggregation over a filtered match (beyond the proto surface):
  // {collection_name, filter, field, k?, user_ids?} ->
  // {values: [...], counts: [...]}
  server.createContext("/facets", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val fc = svc.facetCounts(
      b("collection_name").asInstanceOf[String],
      parseFilter(b("filter")),
      field = b("field").asInstanceOf[String],
      k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt,
      userIds = b.get("user_ids").map(parseIds).getOrElse(Nil))
    Map("values" -> fc.map(_._1), "counts" -> fc.map(_._2))
  })

  // Term dictionary (beyond the proto surface): {collection_name,
  // prefix?, k?, user_ids?} -> {terms: [...], counts: [...]}
  server.createContext("/term_stats", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val ts = svc.termStats(
      b("collection_name").asInstanceOf[String],
      prefix = b.getOrElse("prefix", "").asInstanceOf[String],
      k = b.getOrElse("k", 20.0).asInstanceOf[Double].toInt,
      userIds = b.get("user_ids").map(parseIds).getOrElse(Nil))
    Map("terms" -> ts.map(_._1), "counts" -> ts.map(_._2))
  })

  // Range facets (beyond the proto surface): {collection_name, filter,
  // field, buckets: [[lo, hi], ...]} -> {bucket_lo: [...], bucket_hi:
  // [...], counts: [...]} — half-open [lo, hi) numeric histogram over
  // the newest-wins match set
  server.createContext("/facet_ranges", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val buckets = b("buckets").asInstanceOf[Vector[Any]].map { x =>
      val pair = Json.doubles(x)
      require(pair.length == 2, s"bucket must be [lo, hi]: $x")
      (pair(0), pair(1))
    }
    val fr = svc.facetRanges(
      b("collection_name").asInstanceOf[String],
      parseFilter(b("filter")),
      field = b("field").asInstanceOf[String],
      buckets = buckets,
      userIds = b.get("user_ids").map(parseIds).getOrElse(Nil))
    Map("bucket_lo" -> fr.map(_._1), "bucket_hi" -> fr.map(_._2),
      "counts" -> fr.map(_._3))
  })

  // "Did you mean" suggester (beyond the proto surface): {collection_name,
  // field, input, k?, max_dist?, user_ids?} ->
  // {terms: [...], distances: [...], counts: [...]}
  server.createContext("/suggest", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val sg = svc.suggest(
      b("collection_name").asInstanceOf[String],
      field = b("field").asInstanceOf[String],
      input = b("input").asInstanceOf[String],
      k = b.getOrElse("k", 5.0).asInstanceOf[Double].toInt,
      maxDist = b.getOrElse("max_dist", 2.0).asInstanceOf[Double].toInt,
      userIds = b.get("user_ids").map(parseIds).getOrElse(Nil))
    Map("terms" -> sg.map(_._1), "distances" -> sg.map(_._2),
      "counts" -> sg.map(_._3))
  })

  // BM25 ranked retrieval (beyond the proto surface, round 16):
  // {collection_name, field, query, k?, user_ids?} ->
  // {ids: [uuid], scores: [...], n_terms_hit: [...]} (score desc).
  // Multi-field boosts: pass `fields: {name: weight, ...}` instead of
  // `field` (the ES multi_match shape) — n_terms_hit then counts FIELDS.
  // Optional `filter`: DocumentFilter JSON as filter context (the ES
  // bool.filter contract — restricts results, never touches scores).
  server.createContext("/rank", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt
    val userIds = b.get("user_ids").map(parseIds).getOrElse(Nil)
    val filt = b.get("filter").map(parseFilter)
    val rs = b.get("fields") match {
      case Some(fs) =>
        val fields = fs.asInstanceOf[Map[String, Any]].toSeq
          .map { case (f, w) => f -> w.asInstanceOf[Double] }.sortBy(_._1)
        svc.rankedSearchFields(b("collection_name").asInstanceOf[String],
          fields, b("query").asInstanceOf[String], k, userIds, filt)
      case None =>
        svc.rankedSearch(b("collection_name").asInstanceOf[String],
          field = b("field").asInstanceOf[String],
          query = b("query").asInstanceOf[String], k = k, userIds = userIds,
          filter = filt)
    }
    Map("ids" -> rs.map(_._1), "scores" -> rs.map(_._2),
      "n_terms_hit" -> rs.map(_._3))
  })

  // More-like-this over the persisted index (round 16):
  // {collection_name, field, user_id, doc_id, m?, k?} ->
  // {ids: [uuid], scores: [...], n_terms_hit: [...]} (score desc)
  server.createContext("/more_like_this", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val rs = svc.moreLikeThis(
      b("collection_name").asInstanceOf[String],
      field = b("field").asInstanceOf[String],
      userUuid = b("user_id").asInstanceOf[String],
      docUuid = b("doc_id").asInstanceOf[String],
      m = b.getOrElse("m", 5.0).asInstanceOf[Double].toInt,
      k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt,
      filter = b.get("filter").map(parseFilter))
    Map("ids" -> rs.map(_._1), "scores" -> rs.map(_._2),
      "n_terms_hit" -> rs.map(_._3))
  })

  // Hybrid lexical+vector retrieval (beyond the proto surface, round 16 —
  // the ES kNN+BM25 RRF shape): {collection_name, field, query, vector,
  // k?, window?, nprobe?, user_ids?, filter?} ->
  // {ids, rrf_scores, n_lists} (rrf_score desc)
  server.createContext("/hybrid_rank", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val rs = svc.hybridSearch(
      b("collection_name").asInstanceOf[String],
      field = b("field").asInstanceOf[String],
      query = b("query").asInstanceOf[String],
      vector = Json.doubles(b("vector")),
      k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt,
      window = b.getOrElse("window", 50.0).asInstanceOf[Double].toInt,
      nprobe = b.getOrElse("nprobe", 10.0).asInstanceOf[Double].toInt,
      centroidDistanceRatio = b.getOrElse("centroid_distance_ratio", 0.1)
        .asInstanceOf[Double],
      userIds = b.get("user_ids").map(parseIds).getOrElse(Nil),
      filter = b.get("filter").map(parseFilter))
    Map("ids" -> rs.map(_._1), "rrf_scores" -> rs.map(_._2),
      "n_lists" -> rs.map(_._3))
  })

  // Recall calibration (beyond the proto surface): {collection_name, k?,
  // n_queries?, ladder?} -> {nprobe: [...], recall: [...]} — measures +
  // persists the curve that `target_recall` searches resolve against
  server.createContext("/calibrate", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val curve = svc.calibrate(
      b("collection_name").asInstanceOf[String],
      k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt,
      nQueries = b.getOrElse("n_queries", 32.0).asInstanceOf[Double].toInt,
      ladder = b.get("ladder").map(Json.doubles(_).map(_.toInt))
        .getOrElse(Seq(1, 2, 4, 8, 16, 32, 64, 128)))
    Map("nprobe" -> curve.map(_._1.toLong), "recall" -> curve.map(_._2))
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
        parseIds(b("user_ids")).head)
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
        parseIds(b("user_ids")).head)
      .termSearch(parseFilter(b("filter")),
        limit = b.getOrElse("limit", 10.0).asInstanceOf[Double].toInt)
    Map("doc_ids" -> docIds)
  })

  server.createContext("/serve_facets", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val fc = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        parseIds(b("user_ids")).head)
      .facetCounts(parseFilter(b("filter")),
        facetField = b("field").asInstanceOf[String],
        k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt)
    Map("values" -> fc.map(_._1.orNull), "counts" -> fc.map(_._2))
  })

  server.createContext("/serve_term_stats", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val ts = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        parseIds(b("user_ids")).head)
      .termStats(
        prefix = b.getOrElse("prefix", "").asInstanceOf[String],
        k = b.getOrElse("k", 20.0).asInstanceOf[Double].toInt)
    Map("terms" -> ts.map(_._1), "counts" -> ts.map(_._2))
  })

  server.createContext("/serve_facet_ranges", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val buckets = b("buckets").asInstanceOf[Vector[Any]].map { x =>
      val pair = Json.doubles(x)
      require(pair.length == 2, s"bucket must be [lo, hi]: $x")
      (pair(0), pair(1))
    }
    val fr = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        parseIds(b("user_ids")).head)
      .facetRanges(parseFilter(b("filter")),
        field = b("field").asInstanceOf[String], buckets = buckets)
    Map("bucket_lo" -> fr.map(_._1), "bucket_hi" -> fr.map(_._2),
      "counts" -> fr.map(_._3))
  })

  server.createContext("/serve_suggest", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val sg = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        parseIds(b("user_ids")).head)
      .suggest(
        field = b("field").asInstanceOf[String],
        input = b("input").asInstanceOf[String],
        k = b.getOrElse("k", 5.0).asInstanceOf[Double].toInt,
        maxDist = b.getOrElse("max_dist", 2.0).asInstanceOf[Double].toInt)
    Map("terms" -> sg.map(_._1), "distances" -> sg.map(_._2),
      "counts" -> sg.map(_._3))
  })

  server.createContext("/serve_rank", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val view = svc.serveUser(
      b("collection_name").asInstanceOf[String],
      parseIds(b("user_ids")).head)
    val k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt
    val filt = b.get("filter").map(parseFilter)
    val rs = b.get("fields") match {
      case Some(fs) =>
        val fields = fs.asInstanceOf[Map[String, Any]].toSeq
          .map { case (f, w) => f -> w.asInstanceOf[Double] }.sortBy(_._1)
        view.rankedSearchFields(fields, b("query").asInstanceOf[String], k,
          filter = filt)
      case None =>
        view.rankedSearch(
          field = b("field").asInstanceOf[String],
          query = b("query").asInstanceOf[String], k = k, filter = filt)
    }
    Map("ids" -> rs.map(_._1), "scores" -> rs.map(_._2),
      "n_terms_hit" -> rs.map(_._3))
  })

  server.createContext("/serve_hybrid_rank", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val rs = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        parseIds(b("user_ids")).head)
      .hybridSearch(
        field = b("field").asInstanceOf[String],
        query = b("query").asInstanceOf[String],
        vector = Json.doubles(b("vector")).toArray,
        k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt,
        nprobe = b.getOrElse("nprobe", 10.0).asInstanceOf[Double].toInt,
        window = b.getOrElse("window", 50.0).asInstanceOf[Double].toInt,
        filter = b.get("filter").map(parseFilter))
    Map("ids" -> rs.map(_._1), "rrf_scores" -> rs.map(_._2),
      "n_lists" -> rs.map(_._3))
  })

  server.createContext("/serve_more_like_this", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val rs = svc.serveUser(
        b("collection_name").asInstanceOf[String],
        parseIds(b("user_ids")).head)
      .moreLikeThis(
        field = b("field").asInstanceOf[String],
        docUuid = b("doc_id").asInstanceOf[String],
        m = b.getOrElse("m", 5.0).asInstanceOf[Double].toInt,
        k = b.getOrElse("k", 10.0).asInstanceOf[Double].toInt,
        filter = b.get("filter").map(parseFilter))
    Map("ids" -> rs.map(_._1), "scores" -> rs.map(_._2),
      "n_terms_hit" -> rs.map(_._3))
  })

  server.createContext("/remove", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    svc.remove(
      b("collection_name").asInstanceOf[String],
      parseIds(b("user_ids")),
      parseIds(b("doc_ids")))
    // proto RemoveResponse.success plus the legacy key
    Map("success" -> true, "removed" -> true)
  })

  server.createContext("/segments", (ex: HttpExchange) => handle(ex) {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val name = q.split("&").collectFirst {
      case kv if kv.startsWith("collection=") => kv.stripPrefix("collection=")
    }.getOrElse(sys.error("missing collection query param"))
    // names for compatibility, plus the reference's size reporting
    // (build-time row counts from segment metadata — no data scan)
    Map("segments" -> svc.getSegments(name),
      "segment_stats" -> svc.getSegmentStats(name).map { case (s, n) =>
        Map("name" -> s, "rows" -> n)
      })
  })

  // one optimizer tick: size-tiered merge back to the segment cap, else
  // auto-vacuum past the tombstone threshold (the reference's background
  // loop as an admin call); returns the action taken, null when a no-op
  server.createContext("/optimize", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val name = b.getOrElse("collection_name",
      sys.error("missing collection_name")).toString
    Map("action" -> svc.optimize(name).orNull)
  })

  // back up one retained version (default: current) into dest_base — the
  // disaster-recovery/clone admin call over Collection.backup; the clone
  // is an independently servable collection root. dest_base is RELATIVE
  // to <basePath>/_backups: the wire surface never writes outside the
  // service root (the bind is localhost-only, but DNS rebinding or a
  // cross-origin text/plain POST can still reach 127.0.0.1 — an absolute
  // path here would let a browser write a clone anywhere the process
  // can). Programmatic callers keep the unrestricted Collection.backup.
  server.createContext("/backup", (ex: HttpExchange) => handle(ex) {
    val b = readBody(ex)
    val name = b.getOrElse("collection_name",
      sys.error("missing collection_name")).toString
    val rel = b.getOrElse("dest_base", sys.error("missing dest_base")).toString
    val root = java.nio.file.Paths.get(svc.basePath, "_backups")
      .toAbsolutePath.normalize
    val dest = root.resolve(rel).normalize
    require(!java.nio.file.Paths.get(rel).isAbsolute && dest.startsWith(root),
      s"dest_base must be a relative path under the service backup root")
    val v = b.get("version").map(x => x.toString.toDouble.toLong)
    Map("version" -> svc.backup(name, dest.toString, v),
      "dest_base" -> dest.toString)
  })

  def start(): GraftHttpServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
