package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.{GraftHttpServer, GraftService, Json}

/** Proto-JSON conformance: the reference's README Quick Start payloads
  * (README.md:44-190) posted VERBATIM against the HTTP surface, plus one
  * request per remaining muopdb.proto RPC/field shape (Id as
  * {low_id, high_id}, DocumentFilter and/or/not_contains/ids trees,
  * InsertPacked byte layout), each asserting the proto response message
  * field for field — so a future gRPC binding over [[GraftService]] is a
  * transport swap, not a re-mapping. */
class ProtoConformanceSpec extends SparkSuite {

  private def server(): (GraftHttpServer, String => String => Map[String, Any]) = {
    val svc = new GraftService(spark, Files.createTempDirectory("graft_proto").toString)
    val s = new GraftHttpServer(svc).start()
    val client = HttpClient.newHttpClient()
    def post(route: String)(body: String): Map[String, Any] = {
      val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${s.boundPort}$route"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200, s"$route -> ${resp.statusCode()}: ${resp.body()}")
      Json.obj(Json.parse(resp.body()))
    }
    (s, post)
  }

  test("README Quick Start payloads, byte for byte") {
    val (srv, post) = server()
    try {
      // 1. Create collection — README.md:45-64 verbatim (wal/flush tuning
      // keys are accepted; durability maps to Spark checkpointing)
      val created = post("/create_collection")(
        """{
    "collection_name": "test-collection-2",
    "num_features": 10,
    "wal_file_size": 1024000000,
    "max_time_to_flush_ms": 5000,
    "max_pending_ops": 10,
    "attribute_schema": {
        "attributes": [
            {
                "name": "title",
                "type": "ATTRIBUTE_TYPE_TEXT",
                "language": "english"
            },
            {
                "name": "content",
                "type": "ATTRIBUTE_TYPE_TEXT",
                "language": "english"
            }
        ]
    }
}""")
      assert(created("message").asInstanceOf[String].nonEmpty) // CreateCollectionResponse.message

      // 2. Insert — README.md:72-100 verbatim
      val ins = post("/insert")(
        """{
    "collection_name": "test-collection-2",
    "doc_ids": [
        {
            "uuid": "00000000-0000-0000-0000-000000000064"
        }
    ],
    "user_ids": [
        {
            "uuid": "00000000-0000-0000-0000-000000000000"
        }
    ],
    "vectors": [
        100.0, 101.0, 102.0, 103.0, 104.0, 105.0, 106.0, 107.0, 108.0, 109.0
    ],
    "attributes": {
        "values": [
            {
                "value": {
                    "title": {
                        "text_value": "Example Document"
                    },
                    "content": {
                        "text_value": "This is an example document for search demonstration"
                    }
                }
            }
        ]
    }
}""")
      assert(ins("num_docs_inserted") === 1.0) // InsertResponse.num_docs_inserted

      // the reference auto-flushes after max_time_to_flush_ms; flush
      // explicitly and check FlushResponse.flushed_segments
      val fl = post("/flush")("""{"collection_name": "test-collection-2"}""")
      assert(fl("flushed_segments") === Vector("seg_1"))

      // 3. Search — README.md:105-122 verbatim; SearchResponse = proto
      // doc_ids (Id objects) + scores + num_pages_accessed
      val searchBody =
        """{
    "collection_name": "test-collection-2",
    "params": {
        "ef_construction": 200,
        "record_metrics": false,
        "top_k": 1
    },
    "user_ids": [
        {
            "uuid": "00000000-0000-0000-0000-000000000000"
        }
    ],
    "vector": [100.0, 101.0, 102.0, 103.0, 104.0, 105.0, 106.0, 107.0, 108.0, 109.0]
}"""
      val res = post("/search")(searchBody)
      assert(res("doc_ids") ===
        Vector(Map("uuid" -> "00000000-0000-0000-0000-000000000064")))
      assert(res("scores") === Vector(0.0))
      assert(res.contains("num_pages_accessed"))

      // 6. TermSearch — README.md:170-186 verbatim (run before Remove so
      // the doc still matches); TermSearchResponse.{doc_ids, num_docs}
      val ts = post("/term_search")(
        """{
    "collection_name": "test-collection-2",
    "user_ids": [
        {
            "uuid": "00000000-0000-0000-0000-000000000000"
        }
    ],
    "limit": 10,
    "filter": {
        "contains": {
            "path": "content",
            "value": "search"
        }
    }
}""")
      assert(ts("doc_ids") ===
        Vector(Map("uuid" -> "00000000-0000-0000-0000-000000000064")))
      assert(ts("num_docs") === 1.0)

      // 4. Remove — README.md:127-146 verbatim; RemoveResponse.success
      val rm = post("/remove")(
        """{
    "collection_name": "test-collection-2",
    "doc_ids": [
        {
            "uuid": "00000000-0000-0000-0000-000000000064"
        }
    ],
    "user_ids": [
        {
            "uuid": "00000000-0000-0000-0000-000000000000"
        }
    ]
}""")
      assert(rm("success") === true)

      // 5. Search again — "You should see something else" (the removed
      // doc no longer returns)
      val res2 = post("/search")(searchBody)
      assert(res2("doc_ids") !==
        Vector(Map("uuid" -> "00000000-0000-0000-0000-000000000064")))
    } finally srv.stop()
  }

  test("remaining proto field shapes: low/high ids, filter trees, InsertPacked bytes") {
    val (srv, post) = server()
    try {
      post("/create_collection")(
        """{"collection_name": "p2", "num_features": 4, "initial_num_centroids": 2,
            "attribute_schema": {"attributes": [
              {"name": "content", "type": "ATTRIBUTE_TYPE_TEXT"}]}}""")

      // proto Id as {low_id, high_id} (muopdb.proto:72-81): uint64 halves,
      // JSON numbers or strings
      post("/insert")(
        """{"collection_name": "p2",
            "doc_ids": [{"low_id": 7}, {"low_id": 8, "high_id": 1}],
            "user_ids": [{"low_id": 0}],
            "vectors": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
            "attributes": {"values": [
              {"value": {"content": {"text_value": "alpha beta"}}},
              {"value": {"content": {"text_value": "beta gamma"}}}]}}""")
      post("/flush")("""{"collection_name": "p2"}""")

      // InsertPacked (muopdb.proto:199-213): doc_ids = 16-byte LE u128s,
      // vectors = LE f32 bytes, both base64 in JSON
      val idBytes = new Array[Byte](16)
      idBytes(0) = 9 // u128 LE: low byte first -> id 9
      val vecBuf = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Seq(9.0f, 9.0f, 9.0f, 9.0f).foreach(vecBuf.putFloat)
      val b64 = java.util.Base64.getEncoder
      val packed = post("/insert_packed")(
        s"""{"collection_name": "p2",
             "doc_ids": "${b64.encodeToString(idBytes)}",
             "vectors": "${b64.encodeToString(vecBuf.array())}",
             "user_ids": [{"low_id": 0}]}""")
      assert(packed("num_docs_inserted") === 1.0)
      post("/flush")("""{"collection_name": "p2"}""")

      // full DocumentFilter tree in proto shape: and/or wrap
      // {filters: [...]}, leaves use {contains/not_contains: {path, value}}
      // and {ids: {ids: [...]}}
      val ts = post("/term_search")(
        """{"collection_name": "p2", "user_ids": [{"low_id": 0}], "limit": 10,
            "filter": {"and": {"filters": [
              {"contains": {"path": "content", "value": "beta"}},
              {"not_contains": {"path": "content", "value": "gamma"}}]}}}""")
      assert(ts("doc_ids") ===
        Vector(Map("uuid" -> "00000000-0000-0000-0000-000000000007")))

      // proto IdsFilter: {ids: {ids: [...]}} nesting, with ids as JSON
      // strings (proto JSON emits uint64 as strings) and as numbers.
      // Ids are POINT ids (IdsIter semantics): dense per-user 1-based in
      // doc-id order, so point 1 = uuid ...07 in the first segment
      val idsTs = post("/term_search")(
        """{"collection_name": "p2", "user_ids": [{"low_id": 0}], "limit": 10,
            "filter": {"and": {"filters": [
              {"ids": {"ids": ["1", 7]}},
              {"contains": {"path": "content", "value": "beta"}}]}}}""")
      assert(idsTs("doc_ids") ===
        Vector(Map("uuid" -> "00000000-0000-0000-0000-000000000007")))

      // proto SearchRequest with where_document + params; the packed doc
      // (id 9, vector [9,9,9,9]) is nearest to [9,9,9,9]
      val s2 = post("/search")(
        """{"collection_name": "p2",
            "params": {"top_k": 1},
            "user_ids": [{"low_id": 0}],
            "vector": [9.0, 9.0, 9.0, 9.0]}""")
      assert(s2("doc_ids") ===
        Vector(Map("uuid" -> "00000000-0000-0000-0000-000000000009")))
    } finally srv.stop()
  }
}
