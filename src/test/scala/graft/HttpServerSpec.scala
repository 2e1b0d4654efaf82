package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.{GraftHttpServer, GraftService, Json}

/** Network service surface: the reference's quick-start driven over HTTP
  * (muopdb.proto route-for-route; FIXTURES.md §1.5). */
class HttpServerSpec extends SparkSuite {

  private def uuid(n: Long): String = f"00000000-0000-0000-0000-$n%012x"

  test("quick-start over the wire: create -> insert -> flush -> search -> remove") {
    val svc = new GraftService(spark, Files.createTempDirectory("graft_http").toString)
    val server = new GraftHttpServer(svc).start()
    val client = HttpClient.newHttpClient()
    def post(route: String, body: String): Map[String, Any] = {
      val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}$route"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200, s"$route -> ${resp.statusCode()}: ${resp.body()}")
      Json.obj(Json.parse(resp.body()))
    }
    def get(route: String): Map[String, Any] = {
      val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}$route"))
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200, resp.body())
      Json.obj(Json.parse(resp.body()))
    }
    try {
      post("/create_collection", Json.write(Map(
        "name" -> "wire", "num_features" -> 4, "initial_num_centroids" -> 2,
        "attribute_schema" -> Seq(Map("name" -> "content", "kind" -> "text")))))
      val inserted = post("/insert", Json.write(Map(
        "collection_name" -> "wire",
        "doc_ids" -> Seq(uuid(1), uuid(2)),
        "user_ids" -> Seq(uuid(0)),
        "vectors" -> Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0),
        "attributes" -> Map("content" -> Seq("hello world", "searchable document")))))
      assert(inserted("inserted") === 2.0)
      val flushed = post("/flush", Json.write(Map("collection_name" -> "wire")))
      assert(flushed("flushed_segment") === "seg_1")
      assert(get("/segments?collection=wire")("segments") === Vector("seg_1"))

      val res = post("/search", Json.write(Map(
        "collection_name" -> "wire", "vector" -> Seq(1.0, 2.0, 3.0, 4.0),
        "top_k" -> 1, "num_explored_centroids" -> 2)))
      assert(res("doc_ids") === Vector(uuid(1)))
      assert(res("scores") === Vector(0.0))

      // hybrid search with a text filter over the wire
      val hybrid = post("/search", Json.write(Map(
        "collection_name" -> "wire", "vector" -> Seq(1.1, 2.1, 3.1, 4.1),
        "top_k" -> 5, "num_explored_centroids" -> 2,
        "centroid_distance_ratio" -> 1e9,
        "filter" -> Map("field" -> "content", "value" -> "searchable"))))
      assert(hybrid("doc_ids") === Vector(uuid(2)))

      // term search over the wire, with a full boolean filter tree
      // (And + NotContains — the proto DocumentFilter surface)
      val ts = post("/term_search", Json.write(Map(
        "collection_name" -> "wire",
        "filter" -> Map("field" -> "content", "value" -> "searchable"))))
      assert(ts("doc_ids") === Vector(uuid(2)))
      val tree = post("/term_search", Json.write(Map(
        "collection_name" -> "wire",
        "filter" -> Map("and" -> Seq(
          Map("or" -> Seq(
            Map("field" -> "content", "value" -> "hello"),
            Map("field" -> "content", "value" -> "searchable"))),
          Map("not_contains" -> Map("field" -> "content", "value" -> "hello")))))))
      assert(tree("doc_ids") === Vector(uuid(2)))
      // the same tree as a hybrid /search filter
      val hybridTree = post("/search", Json.write(Map(
        "collection_name" -> "wire", "vector" -> Seq(1.1, 2.1, 3.1, 4.1),
        "top_k" -> 5, "num_explored_centroids" -> 2,
        "centroid_distance_ratio" -> 1e9,
        "filter" -> Map("and" -> Seq(
          Map("field" -> "content", "value" -> "searchable"),
          Map("not_contains" -> Map("field" -> "content", "value" -> "hello")))))))
      assert(hybridTree("doc_ids") === Vector(uuid(2)))

      // served (zero-Spark-jobs) routes answer the same queries
      val servedHit = post("/serve_search", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "vector" -> Seq(1.0, 2.0, 3.0, 4.0), "top_k" -> 1, "nprobe" -> 2)))
      assert(servedHit("doc_ids") === Vector(uuid(1)))
      val servedTs = post("/serve_term_search", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "filter" -> Map("field" -> "content", "value" -> "searchable"))))
      assert(servedTs("doc_ids") === Vector(uuid(2)))

      // positional filters over the wire (beyond-proto): phrase matches
      // consecutive analyzed tokens only; near bounds the distance
      val phrase = post("/term_search", Json.write(Map(
        "collection_name" -> "wire",
        "filter" -> Map("phrase" -> Map("field" -> "content", "value" -> "hello world")))))
      assert(phrase("doc_ids") === Vector(uuid(1)))
      val phraseRev = post("/term_search", Json.write(Map(
        "collection_name" -> "wire",
        "filter" -> Map("phrase" -> Map("field" -> "content", "value" -> "world hello")))))
      assert(phraseRev("doc_ids") === Vector())
      val near = post("/serve_term_search", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "filter" -> Map("near" -> Map("field" -> "content",
          "left" -> "world", "right" -> "hello", "window" -> 1)))))
      assert(near("doc_ids") === Vector(uuid(1)))

      // facet counts over the wire (beyond-proto aggregation surface):
      // every live doc matches 'hello' OR 'searchable'; bucket by the raw
      // content attribute -> one bucket per distinct string, count 1 each
      val facets = post("/facets", Json.write(Map(
        "collection_name" -> "wire",
        "filter" -> Map("or" -> Seq(
          Map("field" -> "content", "value" -> "hello"),
          Map("field" -> "content", "value" -> "searchable"))),
        "field" -> "content", "k" -> 10)))
      assert(facets("counts") === Vector(1.0, 1.0))
      assert(facets("values").asInstanceOf[Vector[Any]].size === 2)

      // term dictionary over the wire: both live docs carry a token
      // starting with 'hello'/'searchable' under the content field prefix
      val tstats = post("/term_stats", Json.write(Map(
        "collection_name" -> "wire", "prefix" -> "content:hello", "k" -> 5)))
      assert(tstats("terms") === Vector("content:hello"))
      assert(tstats("counts") === Vector(1.0))

      // dictionary multi-term queries over the wire (beyond-proto):
      // prefix matches the stem 'searchabl'; fuzzy 'hallo'~1 hits 'hello'
      val prefix = post("/term_search", Json.write(Map(
        "collection_name" -> "wire",
        "filter" -> Map("prefix" -> Map("field" -> "content", "value" -> "sea")))))
      assert(prefix("doc_ids") === Vector(uuid(2)))
      val fuzzy = post("/term_search", Json.write(Map(
        "collection_name" -> "wire",
        "filter" -> Map("fuzzy" -> Map("field" -> "content",
          "value" -> "hallo", "max_dist" -> 1)))))
      assert(fuzzy("doc_ids") === Vector(uuid(1)))
      // a multi-token Near operand is a 400, not a silent truncation
      val badNear = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.boundPort}/term_search"))
        .POST(HttpRequest.BodyPublishers.ofString(Json.write(Map(
          "collection_name" -> "wire",
          "filter" -> Map("near" -> Map("field" -> "content",
            "left" -> "hello world", "right" -> "x", "window" -> 2)))))).build()
      assert(client.send(badNear, HttpResponse.BodyHandlers.ofString())
        .statusCode() >= 400)

      // "did you mean" over the wire: 'helo' is 1 edit from 'hello'
      val sug = post("/suggest", Json.write(Map(
        "collection_name" -> "wire", "field" -> "content",
        "input" -> "helo", "max_dist" -> 1)))
      assert(sug("terms") === Vector("content:hello"))
      assert(sug("distances") === Vector(1.0))
      assert(sug("counts") === Vector(1.0))

      // BM25 ranked retrieval over the wire (round 16) + the served
      // mirror: same ids and scores with zero Spark jobs
      val rank = post("/rank", Json.write(Map(
        "collection_name" -> "wire", "field" -> "content",
        "query" -> "hello", "k" -> 5)))
      assert(rank("ids") === Vector(uuid(1)))
      assert(rank("n_terms_hit") === Vector(1.0))
      val srvRank = post("/serve_rank", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "field" -> "content", "query" -> "hello", "k" -> 5)))
      assert(srvRank("ids") === rank("ids"))
      assert(srvRank("scores") === rank("scores"))
      // multi-field form: one field at weight 1.0 IS the single-field
      // answer, over the wire and on the served mirror
      val multiRank = post("/rank", Json.write(Map(
        "collection_name" -> "wire", "query" -> "hello",
        "fields" -> Map("content" -> 1.0), "k" -> 5)))
      assert(multiRank("ids") === rank("ids"))
      assert(multiRank("scores") === rank("scores"))
      val srvMulti = post("/serve_rank", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "query" -> "hello", "fields" -> Map("content" -> 1.0), "k" -> 5)))
      assert(srvMulti("ids") === rank("ids"))
      assert(srvMulti("scores") === rank("scores"))
      // filter context over the wire (the ES bool.filter shape): a
      // passing filter leaves ids AND scores untouched; an excluding
      // one empties the result — on both the Spark and the served route
      val rankKeep = post("/rank", Json.write(Map(
        "collection_name" -> "wire", "field" -> "content",
        "query" -> "hello", "k" -> 5,
        "filter" -> Map("field" -> "content", "value" -> "world"))))
      assert(rankKeep("ids") === rank("ids") &&
        rankKeep("scores") === rank("scores"))
      val rankDrop = post("/serve_rank", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "field" -> "content", "query" -> "hello", "k" -> 5,
        "filter" -> Map("not_contains" ->
          Map("field" -> "content", "value" -> "hello")))))
      assert(rankDrop("ids") === Vector())
      // hybrid BM25+ANN RRF over the wire: doc 1 tops both lists
      // (rrf 2/61), doc 2 rides the vector list alone (1/62); the
      // served route must agree exactly
      val hyb = post("/hybrid_rank", Json.write(Map(
        "collection_name" -> "wire", "field" -> "content",
        "query" -> "hello", "vector" -> Seq(1.0, 2.0, 3.0, 4.0),
        "k" -> 5, "nprobe" -> 2, "centroid_distance_ratio" -> 1e9)))
      assert(hyb("ids") === Vector(uuid(1), uuid(2)))
      assert(hyb("n_lists") === Vector(2.0, 1.0))
      val srvHyb = post("/serve_hybrid_rank", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "field" -> "content", "query" -> "hello",
        "vector" -> Seq(1.0, 2.0, 3.0, 4.0), "k" -> 5, "nprobe" -> 2)))
      assert(srvHyb("ids") === hyb("ids") &&
        srvHyb("rrf_scores") === hyb("rrf_scores"))

      // more-like-this over the wire: doc 1's profile (hello, world)
      // matches no OTHER doc — route shape + seed exclusion + the served
      // mirror's agreement
      val mlt = post("/more_like_this", Json.write(Map(
        "collection_name" -> "wire", "field" -> "content",
        "user_id" -> uuid(0), "doc_id" -> uuid(1), "m" -> 3, "k" -> 5)))
      assert(mlt("ids") === Vector())
      val srvMlt = post("/serve_more_like_this", Json.write(Map(
        "collection_name" -> "wire", "user_ids" -> Seq(uuid(0)),
        "field" -> "content", "doc_id" -> uuid(1), "m" -> 3, "k" -> 5)))
      assert(srvMlt("ids") === mlt("ids"))

      // range facets over the wire: the wire collection has no numeric
      // attribute, so every bucket counts zero (nulls bucket nowhere) —
      // pins the route shape + the null contract
      // a facet field that is not a numeric schema attribute refuses by
      // name over the wire (round-15 ADVICE: all-zero counts were
      // indistinguishable from a genuinely empty match)
      val frwBad = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.boundPort}/facet_ranges"))
        .POST(HttpRequest.BodyPublishers.ofString(Json.write(Map(
          "collection_name" -> "wire",
          "filter" -> Map("field" -> "content", "value" -> "hello"),
          "field" -> "missing", "buckets" -> Seq(Seq(0.0, 10.0))))))
        .build()
      val frwResp = client.send(frwBad, HttpResponse.BodyHandlers.ofString())
      assert(frwResp.statusCode() === 400 &&
        frwResp.body().contains("numeric attribute"))

      // calibrated search over the wire: POST /calibrate measures +
      // persists the curve (u128 ids ride the rank-window truth path),
      // then target_recall resolves nprobe from it
      val cal = post("/calibrate", Json.write(Map(
        "collection_name" -> "wire", "k" -> 1, "n_queries" -> 2,
        "ladder" -> Seq(1, 2))))
      assert(Json.doubles(cal("recall")).last === 1.0)
      val tr = post("/search", Json.write(Map(
        "collection_name" -> "wire", "vector" -> Seq(1.0, 2.0, 3.0, 4.0),
        "top_k" -> 1, "target_recall" -> 0.9)))
      assert(tr("doc_ids") === Vector(uuid(1)))

      post("/remove", Json.write(Map(
        "collection_name" -> "wire",
        "user_ids" -> Seq(uuid(0)), "doc_ids" -> Seq(uuid(1)))))
      val after = post("/search", Json.write(Map(
        "collection_name" -> "wire", "vector" -> Seq(1.1, 2.1, 3.1, 4.1),
        "top_k" -> 5, "num_explored_centroids" -> 2,
        "centroid_distance_ratio" -> 1e9)))
      assert(after("doc_ids") === Vector(uuid(2)))

      // one optimizer tick over the wire (M3 as an admin call): half the
      // only segment is tombstoned -> auto-vacuum rewrites it in place
      val opt = post("/optimize", Json.write(Map("collection_name" -> "wire")))
      assert(String.valueOf(opt("action")).startsWith("vacuumed"))
      val segs = get("/segments?collection=wire")
      assert(segs("segments") === Vector("seg_1_v"))
      // size reporting: the vacuumed segment holds exactly the one
      // surviving doc (build-time metadata, no data scan)
      val stats = segs("segment_stats").asInstanceOf[Vector[Any]]
        .map(Json.obj(_))
      assert(stats.map(s => String.valueOf(s("name"))) === Vector("seg_1_v"))
      assert(stats.map(s => String.valueOf(s("rows")).toDouble.toLong) === Vector(1L))
      val postOpt = post("/search", Json.write(Map(
        "collection_name" -> "wire", "vector" -> Seq(1.1, 2.1, 3.1, 4.1),
        "top_k" -> 5, "num_explored_centroids" -> 2,
        "centroid_distance_ratio" -> 1e9)))
      assert(postOpt("doc_ids") === Vector(uuid(2)))

      // backup over the wire: clone the current version, reopen it as an
      // independent collection, search it (doc 1 was removed above, doc 2
      // survives the vacuum -> the clone serves exactly that state).
      // dest_base is RELATIVE — the route jails it under <base>/_backups
      val bk = post("/backup", Json.write(Map(
        "collection_name" -> "wire", "dest_base" -> "bk1")))
      assert(bk.contains("version"))
      val destBase = String.valueOf(bk("dest_base"))
      assert(destBase == java.nio.file.Paths.get(svc.basePath, "_backups", "bk1")
        .toAbsolutePath.normalize.toString)
      // escape attempts are rejected (path traversal + absolute path)
      for (evil <- Seq("../outside", "/tmp/graft_evil_bk")) {
        val req = HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${server.boundPort}/backup"))
          .POST(HttpRequest.BodyPublishers.ofString(Json.write(Map(
            "collection_name" -> "wire", "dest_base" -> evil)))).build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() >= 400, s"$evil accepted: ${resp.body()}")
      }
      val wireConfig = graft.core.CollectionConfig(name = "wire",
        numFeatures = 4, initialNumCentroids = 2,
        attributeSchema = Seq(graft.core.AttrField("content", "text", "english")))
      val restored = graft.core.Collection.open(spark, destBase, wireConfig)
      val clone = restored.snapshot().search(Seq(1.1, 2.1, 3.1, 4.1),
        graft.operators.SearchParams(topK = 5, numExploredCentroids = Some(2),
          centroidDistanceRatio = 1e9))
      assert(clone.select("doc_id").count() === 1L)

      // malformed request -> 400 with an error body, server stays up
      val bad = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}/search"))
        .POST(HttpRequest.BodyPublishers.ofString("{not json")).build()
      assert(client.send(bad, HttpResponse.BodyHandlers.ofString()).statusCode() === 400)
    } finally server.stop()
  }

  test("Json.write keeps non-finite doubles parseable (null, not bare NaN)") {
    val body = Json.write(Map(
      "scores" -> Seq(1.5, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)))
    assert(body === """{"scores":[1.5,null,null,null]}""")
    assert(Json.parse(body) === Map("scores" -> Vector(1.5, null, null, null)))
  }
}
