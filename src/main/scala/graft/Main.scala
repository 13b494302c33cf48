package graft

import graft.streaming.Engine

/** The executable daemon — the reference's `main()` boot path
  * (`src/main.rs:51-180`) on Spark: argv config path (default
  * `config/connect.json`), build the engine (sinks resolved first, one
  * streaming query per source connector), start, log status, block until a
  * query dies or the process is signalled, clean stop on shutdown.
  *
  * The reference then stands up gRPC servers on `tcp_address` /
  * `unix_socket_path` (`src/main.rs:101-157`). Parity here:
  * `tcp_address` serves REAL gRPC — [[graft.streaming.GrpcControlServer]],
  * the vendored proto spoken as standard HTTP/2 + proto3 binary over the
  * Spark distribution's shaded grpc runtime, so the reference's own
  * clients (`test_grpc_sink.py`, tonic) point here unchanged. The unix
  * socket ALSO serves gRPC ([[graft.streaming.GrpcUdsControlServer]], via
  * the netty epoll native transport the distribution ships; non-epoll
  * platforms fall back to JSON lines there), with the JSON-lines
  * local-CLI surface beside it at `<path>.jsonl`
  * ([[graft.streaming.UnixControlServer]]), and an optional
  * `json_tcp_address` keeps the `nc`-able JSON-lines TCP front
  * ([[graft.streaming.ControlServer]]). Every front dispatches the same
  * transport-agnostic [[graft.streaming.ConnectorService]] verbs.
  *
  * Run: `sbt "runMain graft.Main [config.json [dataRoot [checkpointRoot]]]"`.
  * With the shipped `config/connect.json`, drop text files into the
  * configured watch directory and partitioned JSON appears under dataRoot —
  * records move end-to-end with no broker.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val configPath = args.headOption.getOrElse("config/connect.json")
    val dataRoot = args.lift(1).getOrElse("/tmp/graft/data")
    val checkpointRoot = args.lift(2).getOrElse("/tmp/graft/checkpoints")

    println(s"[graft] loading configuration from $configPath")
    val spark = GraftSession.getOrCreate()
    val engine = Engine.fromConfigFile(spark, configPath, dataRoot, checkpointRoot)

    // control plane: JSON-lines over TCP on the configured address, bound
    // to the same ConnectorService verbs the gRPC front would serve (the
    // proto transport needs ScalaPB codegen unavailable offline).
    // SECURITY: the protocol is unauthenticated and update_config can
    // re-point ingestion, so the bind host comes from tcp_address and
    // should stay loopback (the shipped config's default); a wildcard bind
    // is honored but called out loudly as an operator decision.
    val token = engine.config.flatMap(_.authToken)
    lazy val svc = new graft.streaming.InProcessConnectorService(engine,
      new graft.streaming.PushService(spark),
      () => throw new IllegalStateException("daemon mode has no push sink"))

    def hostPort(a: String): (String, Int) = {
      val host = a.split(":").dropRight(1).mkString(":") match {
        case "" => "127.0.0.1"
        case h => h
      }
      (host, a.split(":").last.toInt)
    }

    // primary wire, reference parity: gRPC on tcp_address. The proto has
    // no authentication (same as the reference), so a non-loopback bind is
    // an explicit operator decision — and when the config sets auth_token,
    // a non-loopback gRPC bind would SILENTLY drop the authentication the
    // operator asked for (the token gates only the JSON-lines fronts).
    // Refuse outright rather than downgrade: the operator either binds
    // loopback, moves the remote surface to json_tcp_address (token
    // enforced), or removes auth_token to acknowledge an open wire.
    def isLoopback(host: String): Boolean =
      host == "localhost" ||
        (try java.net.InetAddress.getByName(host).isLoopbackAddress
         catch { case _: java.net.UnknownHostException => false })
    val grpcControl = engine.config.flatMap(_.tcpAddress).map { a =>
      val (host, port) = hostPort(a)
      if (!isLoopback(host) && token.isDefined)
        throw new IllegalArgumentException(
          s"refusing to bind the gRPC control plane on non-loopback $host: " +
            "auth_token is set but the gRPC proto has no authentication, so " +
            "this bind would silently drop it. Bind tcp_address to loopback, " +
            "serve remote clients from json_tcp_address (which enforces the " +
            "token), or remove auth_token to explicitly accept an open wire.")
      if (host == "0.0.0.0" || host == "::")
        println("[graft] WARNING: gRPC control plane binding ALL interfaces — " +
          "the proto has no authentication and UpdateConfig re-points " +
          "ingestion; use 127.0.0.1 or front it with an authenticating proxy")
      val srv = new graft.streaming.GrpcControlServer(svc, port, host)
      val bound = srv.start()
      println(s"[graft] gRPC control plane listening on $host:$bound")
      srv
    }

    val control = engine.config.flatMap(_.jsonTcpAddress).map { a =>
      val (host, port) = hostPort(a)
      if ((host == "0.0.0.0" || host == "::") && token.isEmpty)
        println("[graft] WARNING: control plane binding ALL interfaces with no " +
          "authentication — any network peer can reconfigure this daemon; " +
          "use 127.0.0.1, set auth_token, or front it with an authenticating proxy")
      val srv = new graft.streaming.ControlServer(svc, port, host, token)
      val bound = srv.start()
      println(s"[graft] control plane listening on $host:$bound (JSON lines)")
      srv
    }

    // second listener, reference parity (`main.rs:128-157`): gRPC on the
    // configured unix socket when the epoll native transport loads (this
    // platform ships it), with the JSON-lines local-CLI surface beside it
    // at `<path>.jsonl`; on non-epoll platforms the socket falls back to
    // JSON lines. Either way access is gated by filesystem permissions.
    val grpcUds = engine.config.flatMap(_.unixSocketPath)
      .filter(_ => graft.streaming.GrpcUdsControlServer.available).map { p =>
        val srv = new graft.streaming.GrpcUdsControlServer(
          svc, java.nio.file.Paths.get(p))
        srv.start()
        println(s"[graft] gRPC control plane listening on unix:$p")
        srv
      }
    val udsControl = engine.config.flatMap(_.unixSocketPath).map { p =>
      val jsonPath = if (grpcUds.isDefined) s"$p.jsonl" else p
      val srv = new graft.streaming.UnixControlServer(
        svc, java.nio.file.Paths.get(jsonPath), token)
      srv.start()
      println(s"[graft] control plane listening on unix:$jsonPath (JSON lines)")
      srv
    }

    engine.start()
    println(s"[graft] connector status: ${engine.status}")

    sys.addShutdownHook {
      println("[graft] shutting down")
      grpcControl.foreach(_.stop())
      grpcUds.foreach(_.stop())
      control.foreach(_.stop())
      udsControl.foreach(_.stop())
      engine.stop()
    }
    // block like the reference's ctrl_c().await: runs until a query
    // terminates (failure surfaces here) or the JVM is signalled
    spark.streams.awaitAnyTermination()
  }
}
