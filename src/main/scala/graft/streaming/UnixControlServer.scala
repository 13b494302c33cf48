package graft.streaming

import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.channels.{Channels, ServerSocketChannel, SocketChannel}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.concurrent.Executors

/** The unix-domain-socket control endpoint — parity with the reference
  * daemon's second listener (`src/main.rs:128-157` serves the same gRPC
  * service on `unix_socket_path` next to the TCP bind; the shipped
  * `config/connect.json:3` configures both). Same JSON-lines protocol and
  * the same [[ControlProtocol]] verb dispatch as [[ControlServer]] — only
  * the transport differs: JDK 16+ `UnixDomainSocketAddress` channels, no
  * extra dependencies.
  *
  * A UDS bind is the better default for a local control plane: reachability
  * is filesystem permissions on the socket path, not a network boundary —
  * which is why the reference treats the TCP bind as the remote surface and
  * the UDS path as the local CLI's. Drive it with
  * `echo '{"verb":"get_status",...}' | nc -U /path/to.sock`.
  */
final class UnixControlServer(service: ConnectorService, socketPath: Path,
                              authToken: Option[String] = None) {

  private val protocol = new ControlProtocol(service, authToken)
  @volatile private var server: ServerSocketChannel = null
  private val pool = Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "graft-uds-control"); t.setDaemon(true); t
  })

  /** Bind and serve; returns the bound socket path. A stale socket file
    * from a crashed prior run would make bind() throw AddressInUse, so it
    * is reclaimed first — but only after a connect probe proves no live
    * daemon answers on it ([[UnixControlServer.reclaimStaleSocket]]); a
    * second instance must fail loudly, not hijack the control socket.
    */
  def start(): Path = synchronized {
    require(server == null, "already started")
    if (socketPath.getParent != null) Files.createDirectories(socketPath.getParent)
    UnixControlServer.reclaimStaleSocket(socketPath)
    server = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
    server.bind(UnixDomainSocketAddress.of(socketPath))
    pool.submit(new Runnable {
      override def run(): Unit = {
        while (server != null && server.isOpen)
          try {
            val ch = server.accept()
            pool.submit(new Runnable { override def run(): Unit = handle(ch) })
          } catch { case _: Exception => () } // closed during accept
      }
    })
    socketPath
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.close(); server = null }
    Files.deleteIfExists(socketPath)
  }

  private def handle(ch: SocketChannel): Unit =
    try {
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(Channels.newInputStream(ch), UTF_8))
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(Channels.newOutputStream(ch), UTF_8), true)
      var line = in.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) out.println(protocol.dispatch(line))
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally ch.close()
}

object UnixControlServer {
  /** Reclaim a leftover socket file ONLY when it is provably stale: probe
    * it with a connect attempt and delete on connection-refused (the
    * crashed-daemon leftover). If something ANSWERS, another daemon owns
    * the path — fail loudly instead of silently hijacking its control
    * socket (the second instance would otherwise steal the CLI surface of
    * a live daemon). Both UDS fronts (JSON lines here, gRPC in
    * GrpcUdsControlServer) share this guard.
    */
  def reclaimStaleSocket(socketPath: Path): Unit = {
    if (Files.exists(socketPath)) {
      val live =
        try {
          val probe = SocketChannel.open(StandardProtocolFamily.UNIX)
          try probe.connect(UnixDomainSocketAddress.of(socketPath))
          finally probe.close()
          true
        } catch { case _: java.io.IOException => false }
      if (live)
        throw new IllegalStateException(
          s"socket $socketPath is in use by a live daemon; refusing to hijack it")
      Files.deleteIfExists(socketPath)
    }
  }
}
