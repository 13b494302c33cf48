package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.model.{HttpSchemaRegistry, InMemorySchemaRegistry, SchemaRegistry}
import graft.operators.Encode

/** [[HttpSchemaRegistry]] against an in-process Confluent-wire stub on
  * loopback (the ServiceSpec idiom: real sockets, real HTTP, no egress).
  * The stub serves the five public v1 endpoints the client speaks, backed
  * by [[InMemorySchemaRegistry]] — so these tests also pin that both
  * implementations of the [[SchemaRegistry]] trait agree through the wire.
  */
class SchemaRegistryHttpSpec extends SparkSpec with BeforeAndAfterAll {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private var client: HttpSchemaRegistry = _
  private val backing = new InMemorySchemaRegistry
  // (subject, schema text) -> registration, recorded at POST time so the
  // check endpoint stays READ-ONLY (the real registry's lookup never
  // registers)
  private val seen =
    scala.collection.concurrent.TrieMap.empty[(String, String), graft.model.RegisteredSchema]
  @volatile private var lastContentType: String = ""
  // fault injection: ids whose /versions companion answers 500 (a proxy
  // or older registry), and a flag making POST .../versions return 200
  // with a non-registry body (a wrong service on the right port)
  @volatile private var versions500: Set[Int] = Set.empty
  @volatile private var bogusRegisterBody: Boolean = false

  private def reply(x: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    x.getResponseHeaders.set("Content-Type",
      "application/vnd.schemaregistry.v1+json")
    x.sendResponseHeaders(status, b.length.toLong)
    x.getResponseBody.write(b)
    x.close()
  }

  private def schemaOf(x: HttpExchange): String =
    mapper.readTree(new String(x.getRequestBody.readAllBytes(), UTF_8))
      .get("schema").asText()

  private def fullJson(rs: graft.model.RegisteredSchema): String = {
    val n = mapper.createObjectNode()
    n.put("subject", rs.subject); n.put("id", rs.id)
    n.put("version", rs.version); n.put("schema", rs.schemaJson)
    mapper.writeValueAsString(n)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      lastContentType = Option(x.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
      // split the RAW path first: a %2F inside a subject name is part of
      // the segment, not a separator (getPath would pre-decode it)
      val segs = x.getRequestURI.getRawPath.stripPrefix("/").split("/").toList
        .map(s => java.net.URLDecoder.decode(s, UTF_8))
      (x.getRequestMethod, segs) match {
        case ("POST", List("subjects", subj, "versions")) =>
          if (bogusRegisterBody) reply(x, 200, """{"error":"not a registry"}""")
          else {
            val schema = schemaOf(x)
            val rs = backing.register(subj, schema)
            seen.put((subj, schema), rs)
            reply(x, 200, s"""{"id":${rs.id}}""")
          }
        case ("POST", List("subjects", subj)) =>
          // check/lookup: 404 unless this exact schema is registered
          seen.get((subj, schemaOf(x))) match {
            case Some(rs) => reply(x, 200, fullJson(rs))
            case None =>
              reply(x, 404, """{"error_code":40403,"message":"schema not found"}""")
          }
        case ("GET", List("subjects", subj, "versions", "latest")) =>
          backing.latest(subj) match {
            case Some(rs) => reply(x, 200, fullJson(rs))
            case None =>
              reply(x, 404, """{"error_code":40401,"message":"subject not found"}""")
          }
        case ("GET", List("schemas", "ids", id)) =>
          backing.byId(id.toInt) match {
            case Some(rs) =>
              val n = mapper.createObjectNode(); n.put("schema", rs.schemaJson)
              reply(x, 200, mapper.writeValueAsString(n))
            case None =>
              reply(x, 404, """{"error_code":40403,"message":"schema not found"}""")
          }
        case ("GET", List("schemas", "ids", id, "versions"))
            if versions500.contains(id.toInt) =>
          reply(x, 500, """{"error_code":500,"message":"gateway sad"}""")
        case ("GET", List("schemas", "ids", id, "versions")) =>
          backing.byId(id.toInt) match {
            case Some(rs) =>
              val arr = mapper.createArrayNode()
              val e = arr.addObject()
              e.put("subject", rs.subject); e.put("version", rs.version)
              reply(x, 200, mapper.writeValueAsString(arr))
            case None =>
              reply(x, 404, """{"error_code":40403,"message":"schema not found"}""")
          }
        case _ => reply(x, 500, """{"error_code":500,"message":"unexpected route"}""")
      }
    })
    server.start()
    client = new HttpSchemaRegistry(
      s"http://127.0.0.1:${server.getAddress.getPort}")
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private val schemaA = """{"type":"record","name":"A","fields":[]}"""
  private val schemaB = """{"type":"record","name":"B","fields":[]}"""

  test("register over HTTP: identical schema re-registers to the same id, new text bumps the version") {
    val r1 = client.register("events-value", schemaA)
    val again = client.register("events-value", schemaA)
    assert(again == r1) // same id AND same version — registry-side dedup
    val r2 = client.register("events-value", schemaB)
    assert(r2.id != r1.id)
    assert(r2.version == r1.version + 1)
    assert(lastContentType == "application/vnd.schemaregistry.v1+json")
  }

  test("byId and latest round-trip subject, version, and schema text") {
    val r = client.register("orders-value", schemaA)
    val got = client.byId(r.id)
    assert(got.contains(graft.model.RegisteredSchema(
      r.id, "orders-value", r.version, schemaA)))
    val r2 = client.register("orders-value", schemaB)
    assert(client.latest("orders-value").contains(r2))
  }

  test("unknown subject and unknown id map 404 to None, not an exception") {
    assert(client.latest("nope-" + System.nanoTime()).isEmpty)
    assert(client.byId(999999999).isEmpty)
  }

  test("subjects with URL-hostile names survive path encoding") {
    val subj = "weird topic/value"
    val r = client.register(subj, schemaA)
    assert(client.latest(subj).contains(r))
    // a double-quote in the subject must survive the stub's mapper-built
    // JSON and the client's parse — both ends real serializers
    val quoted = """he said "hi"-value"""
    val rq = client.register(quoted, schemaA)
    assert(client.byId(rq.id).map(_.subject).contains(quoted))
  }

  test("byId degrades to schema-text-only when the versions companion errors") {
    val r = client.register("degrade-value", schemaA)
    versions500 = Set(r.id)
    try {
      val got = client.byId(r.id)
      assert(got.contains(graft.model.RegisteredSchema(r.id, "", 0, schemaA)),
        s"a 500 on /versions must not fail the lookup, got $got")
    } finally versions500 = Set.empty
  }

  test("a 2xx body without the expected field fails loudly with the URL context") {
    bogusRegisterBody = true
    try {
      val e = intercept[java.io.IOException](client.register("bogus-value", schemaA))
      assert(e.getMessage.contains("without 'id'"))
      assert(e.getMessage.contains("/subjects/bogus-value/versions"))
    } finally bogusRegisterBody = false
  }

  test("a registry-assigned id frames and recovers through the Confluent wire") {
    import spark.implicits._
    val rs = client.register("frame-value", schemaA)
    val framed = Seq(("payload")).toDF("v")
      .select(Encode.confluentFrame(col("v").cast("binary"), rs.id).as("f"))
    val id = framed.select(Encode.confluentSchemaId(col("f"))).as[Int].head()
    assert(id == rs.id)
    assert(client.byId(id).map(_.schemaJson).contains(schemaA))
  }
}
