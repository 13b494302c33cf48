package graft.streaming

import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** JSON-lines control front: the `nc`-able scripting surface next to the
  * REAL gRPC wire ([[GrpcControlServer]] — `tcp_address`), binding the
  * SAME [[ConnectorService]] verbs (the vendored proto's unary subset —
  * `src/main/protobuf/connector.proto`). One request object per line, one
  * response object per line:
  *
  * {{{
  *   {"verb":"get_status","connector":"file-watch-source"}
  *   {"verb":"get_config","connector":"local-json-sink"}
  *   {"verb":"update_config","config":{"name":"...","connector_class":"...",
  *     "tasks_max":1,"config":{...}}}
  * }}}
  *
  * Streaming verbs (sink/source streams) live on the gRPC wire — a
  * line-oriented transport is the wrong shape for them.
  */
final class ControlServer(service: ConnectorService, port: Int,
                          host: String = "127.0.0.1",
                          authToken: Option[String] = None) {

  private val protocol = new ControlProtocol(service, authToken)
  @volatile private var server: ServerSocket = null
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-control"); t.setDaemon(true); t
  })

  /** Bind and serve; returns the actual port (use 0 to pick a free one).
    *
    * Binds the given host — loopback unless explicitly configured otherwise:
    * the protocol has no authentication, and update_config lets any peer
    * that can reach the socket re-point what data the daemon ingests and
    * writes. A non-loopback bind is an explicit operator decision (put a
    * network boundary or an authenticating proxy in front), never a default.
    */
  def start(): Int = synchronized {
    require(server == null, "already started")
    server = new ServerSocket(port, 50, java.net.InetAddress.getByName(host))
    pool.submit(new Runnable {
      override def run(): Unit = {
        while (server != null && !server.isClosed)
          try {
            val sock = server.accept()
            pool.submit(new Runnable { override def run(): Unit = handle(sock) })
          } catch { case _: Exception => () } // closed during accept
      }
    })
    server.getLocalPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.close(); server = null }
  }

  private def handle(sock: Socket): Unit =
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, UTF_8))
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(sock.getOutputStream, UTF_8), true)
      var line = in.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) out.println(dispatch(line))
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally sock.close()

  private[graft] def dispatch(line: String): String = protocol.dispatch(line)
}

/** The verb dispatch shared by every control transport (TCP
  * [[ControlServer]], UDS [[UnixControlServer]], and a future gRPC front):
  * one JSON request per line in, one JSON response per line out, with the
  * optional shared-secret gate applied before any verb runs.
  */
private[graft] final class ControlProtocol(service: ConnectorService,
                                           authToken: Option[String]) {

  private val mapper = new ObjectMapper()

  private[graft] def dispatch(line: String): String =
    try {
      val req = mapper.readTree(line)
      // shared-secret gate: with a configured token, reject before any verb
      // dispatch — update_config re-points what the daemon ingests/writes
      val presented = Option(req.get("token")).map(_.asText())
      if (authToken.isDefined && presented != authToken)
        return json(Map("error" -> "unauthorized: missing or bad token"))
      val verb = Option(req.get("verb")).map(_.asText()).getOrElse("")
      def connector = Option(req.get("connector")).map(_.asText()).getOrElse("")
      verb match {
        case "get_status" =>
          val st = service.getStatus(Wire.StatusRequest(connector))
          json(Map("state" -> st.state.toString, "worker_id" -> st.workerId,
            "tasks" -> st.tasks.map(t => Map("task_id" -> t.taskId,
              "state" -> t.state.toString).asJava).asJava,
            "error_message" -> st.errorMessage))
        case "get_config" =>
          service.getConfig(Wire.ConfigRequest(connector)).config match {
            case Some(c) => json(Map("name" -> c.name,
              "connector_class" -> c.connectorClass, "tasks_max" -> c.tasksMax,
              "config" -> c.config.asJava))
            case None => json(Map("error" -> s"unknown connector: $connector"))
          }
        case "update_config" =>
          val c = req.get("config")
          val cfgMap = Option(c.get("config")).map(_.properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty[String, String])
          val updated = service.updateConfig(Wire.ConfigUpdateRequest(Wire.ConnectorConfig(
            connectorClass = c.get("connector_class").asText(),
            name = c.get("name").asText(),
            config = cfgMap,
            tasksMax = Option(c.get("tasks_max")).map(_.asInt()).getOrElse(1))))
          updated.config match {
            case Some(cc) => json(Map("name" -> cc.name, "tasks_max" -> cc.tasksMax,
              "config" -> cc.config.asJava))
            case None => json(Map("error" -> "no active config"))
          }
        case other => json(Map("error" -> s"unknown verb: $other"))
      }
    } catch { case e: Exception => json(Map("error" -> String.valueOf(e.getMessage))) }

  private def json(m: Map[String, Any]): String =
    mapper.writeValueAsString(m.asJava)
}
