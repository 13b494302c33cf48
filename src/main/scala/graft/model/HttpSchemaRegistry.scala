package graft.model

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Network-backed [[SchemaRegistry]] over the Confluent Schema Registry
  * REST API — the client half of the reference's roadmap item
  * (`/root/reference/GAP.md:12` "Schema Registry Integration: Not
  * Started"; `/root/reference/docker-compose.yml:32-44` stands up a
  * Confluent-compatible registry on :8081 that no reference code ever
  * calls). Speaks the public v1 wire:
  *
  *  - `POST /subjects/{s}/versions` `{"schema": ...}` → `{"id": N}`
  *    (identical schema text re-registers to the same id);
  *  - `POST /subjects/{s}` `{"schema": ...}` → `{subject, id, version,
  *    schema}` (the check/lookup endpoint — resolves the version the
  *    registration landed on);
  *  - `GET /subjects/{s}/versions/latest` → `{subject, id, version,
  *    schema}`;
  *  - `GET /schemas/ids/{id}` → `{"schema": ...}` and
  *    `GET /schemas/ids/{id}/versions` → `[{subject, version}]`.
  *
  * Pure JDK `java.net.http` + the Jackson already on Spark's classpath —
  * no new dependencies. 404s map to `None` (the `Option` surface of the
  * trait); any other non-2xx raises with the registry's error body, so
  * misconfiguration fails loudly instead of silently framing id 0.
  * The id this client returns is what
  * [[graft.operators.Encode.confluentFrame]] stamps into the 5-byte
  * Confluent wire header (magic 0x00 + big-endian id) — see
  * `f5_confluent_frame`.
  *
  * ServiceSpec-style loopback tests drive it against an in-process stub
  * implementing the same endpoints; only a real external registry is
  * unreachable from this sandbox.
  */
final class HttpSchemaRegistry(baseUrl: String,
                               timeout: Duration = Duration.ofSeconds(10))
    extends SchemaRegistry {

  private val base = baseUrl.stripSuffix("/")
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newBuilder().connectTimeout(timeout).build()

  private val ContentType = "application/vnd.schemaregistry.v1+json"

  private def enc(segment: String): String =
    java.net.URLEncoder.encode(segment, UTF_8).replace("+", "%20")

  private def send(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString())

  // shared status dispatch: 2xx → body, 404 → None, anything else →
  // IOException carrying method/path and the registry's error body
  private def dispatch(method: String, path: String,
      r: HttpResponse[String]): Option[String] =
    r.statusCode() match {
      case ok if ok >= 200 && ok < 300 => Some(r.body())
      case 404 => None
      case other =>
        throw new java.io.IOException(
          s"schema registry $method $path failed: HTTP $other ${r.body().take(200)}")
    }

  private def get(path: String): Option[String] =
    dispatch("GET", path, send(HttpRequest.newBuilder(URI.create(base + path))
      .timeout(timeout).header("Accept", ContentType).GET().build()))

  private def post(path: String, body: String): Option[String] =
    dispatch("POST", path, send(HttpRequest.newBuilder(URI.create(base + path))
      .timeout(timeout)
      .header("Content-Type", ContentType).header("Accept", ContentType)
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()))

  // null-safe field access: a 2xx body missing an expected field (a
  // non-registry service answering on the configured port) must fail
  // with the URL context, not a bare NullPointerException
  private def field(body: String, name: String, ctx: String)
      : com.fasterxml.jackson.databind.JsonNode = {
    val n = mapper.readTree(body).get(name)
    if (n == null) throw new java.io.IOException(
      s"schema registry $ctx returned 2xx without '$name': ${body.take(200)}")
    n
  }

  private def schemaBody(schemaJson: String): String = {
    val node = mapper.createObjectNode()
    node.put("schema", schemaJson)
    mapper.writeValueAsString(node)
  }

  override def register(subject: String, schemaJson: String): RegisteredSchema = {
    val s = enc(subject)
    val id = post(s"/subjects/$s/versions", schemaBody(schemaJson))
      .map(b => field(b, "id", s"POST /subjects/$s/versions").asInt())
      .getOrElse(throw new java.io.IOException(
        s"schema registry refused registration under '$subject' (404)"))
    // the registration response carries only the id; the check endpoint
    // resolves which version it landed on (same round trip the Confluent
    // client makes). NOT atomic (r12 ADVICE, documented rather than
    // papered over): against a live registry a concurrent soft-delete or
    // compatibility-mode change between the two POSTs surfaces as a
    // 404/IOException here even though the registration itself succeeded
    // — the same operational window the Confluent client has.
    val checked = post(s"/subjects/$s", schemaBody(schemaJson))
      .getOrElse(throw new java.io.IOException(
        s"schema registered (id=$id) but lookup under '$subject' 404'd"))
    val ctx = s"POST /subjects/$s"
    RegisteredSchema(id, subject, field(checked, "version", ctx).asInt(),
      field(checked, "schema", ctx).asText())
  }

  /** Two round trips by design: the schema text and its subject/version
    * listing live on different endpoints, and the trait returns the full
    * [[RegisteredSchema]]. The companion lookup DEGRADES on any error —
    * a proxy 403/405/500 or a registry without the /versions listing
    * yields the schema text with blank subject/version rather than
    * failing a lookup whose payload half already succeeded.
    */
  override def byId(id: Int): Option[RegisteredSchema] =
    get(s"/schemas/ids/$id").map { b =>
      val schema = field(b, "schema", s"GET /schemas/ids/$id").asText()
      // the WHOLE companion chain degrades, parse included: a 2xx
      // non-JSON body (proxy/HTML error page) must not fail the lookup
      // whose payload half already succeeded (r12 ADVICE — the old form
      // only caught the GET, so readTree threw past the contract)
      val sv = (try get(s"/schemas/ids/$id/versions")
          .map(mapper.readTree).filter(_.size() > 0).map(_.get(0))
        catch { case scala.util.control.NonFatal(_) => None })
        .filter(n => n.get("subject") != null && n.get("version") != null)
      RegisteredSchema(id,
        sv.map(_.get("subject").asText()).getOrElse(""),
        sv.map(_.get("version").asInt()).getOrElse(0),
        schema)
    }

  override def latest(subject: String): Option[RegisteredSchema] =
    get(s"/subjects/${enc(subject)}/versions/latest").map { b =>
      val ctx = s"GET /subjects/${enc(subject)}/versions/latest"
      RegisteredSchema(field(b, "id", ctx).asInt(),
        field(b, "subject", ctx).asText(),
        field(b, "version", ctx).asInt(),
        field(b, "schema", ctx).asText())
    }
}
