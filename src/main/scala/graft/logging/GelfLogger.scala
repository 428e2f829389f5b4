package graft.logging

import java.net.{DatagramPacket, DatagramSocket, InetAddress, Socket}
import java.nio.charset.StandardCharsets

/** GELF 1.1 structured logging (C9) — the last piece of the reference's
  * platform contract: components log over TCP (null-terminated JSON frames)
  * or UDP to the address the platform injects, with a per-level verbosity
  * policy (`components/ex-iceberg/component_config/loggerConfiguration.json`:
  * monolog levels 100..600 mapped to `normal` / `verbose` / `camouflage`).
  *
  * Verbosity semantics (platform contract):
  *  - `normal`   — message forwarded as-is;
  *  - `verbose`  — message plus all structured fields;
  *  - `camouflage` — the user-visible text is replaced by a generic notice
  *    (internal details must not leak), the original preserved in
  *    `_original_message` for platform-side operators.
  *
  * Pure JDK sockets, no Spark involvement; failures to deliver are swallowed
  * after `close()` — logging must never take the component down.
  */
final class GelfLogger(
    host: String, port: Int, serverType: String = "tcp",
    verbosity: Map[Int, String] = GelfLogger.defaultVerbosity,
    sourceHost: String = "graft-component") extends AutoCloseable {

  import GelfLogger._

  private lazy val tcp: Socket = new Socket(host, port)
  private lazy val udp: DatagramSocket = new DatagramSocket()
  @volatile private var closed = false

  def debug(msg: String, fields: Map[String, String] = Map.empty): Unit = log(Debug, msg, fields)
  def info(msg: String, fields: Map[String, String] = Map.empty): Unit = log(Info, msg, fields)
  def warning(msg: String, fields: Map[String, String] = Map.empty): Unit = log(Warning, msg, fields)
  def error(msg: String, fields: Map[String, String] = Map.empty): Unit = log(Error, msg, fields)
  def critical(msg: String, fields: Map[String, String] = Map.empty): Unit = log(Critical, msg, fields)

  /** Emit one GELF message at a monolog level (100..600). */
  def log(level: Int, message: String, fields: Map[String, String] = Map.empty): Unit = {
    if (closed) return
    val mode = verbosity.getOrElse(level, "normal")
    val (shortMsg, extra) = mode match {
      case "camouflage" =>
        ("Internal error occurred, please contact support.",
          fields + ("original_message" -> message))
      case "verbose" => (message, fields)
      case _ => (message, Map.empty[String, String])
    }
    val payload = render(shortMsg, level, extra)
    try send(payload) catch { case _: Exception => () } // never fail the run
  }

  private def render(msg: String, level: Int, fields: Map[String, String]): String = {
    val sb = new StringBuilder
    sb.append("{\"version\":\"1.1\"")
      .append(",\"host\":").append(q(sourceHost))
      .append(",\"short_message\":").append(q(msg))
      .append(",\"timestamp\":").append(System.currentTimeMillis() / 1000.0)
      .append(",\"level\":").append(syslogSeverity(level))
      .append(",\"_monolog_level\":").append(level)
    fields.toSeq.sortBy(_._1).foreach { case (k, v) =>
      // GELF additional fields are underscore-prefixed; 'id' is reserved
      val key = "_" + k.replaceAll("[^\\w.-]", "_")
      if (key != "_id") sb.append(',').append(q(key)).append(':').append(q(v))
    }
    sb.append('}').toString
  }

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def send(payload: String): Unit = serverType match {
    case "udp" =>
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      udp.send(new DatagramPacket(bytes, bytes.length, InetAddress.getByName(host), port))
    case _ => // tcp: null-terminated frame, one connection for the run
      val out = tcp.getOutputStream
      out.write(payload.getBytes(StandardCharsets.UTF_8))
      out.write(0)
      out.flush()
  }

  override def close(): Unit = {
    closed = true
    try if (serverType != "udp") tcp.close() else udp.close()
    catch { case _: Exception => () }
  }
}

object GelfLogger {

  // monolog levels (the keys of loggerConfiguration.json's verbosity map)
  val Debug = 100
  val Info = 200
  val Notice = 250
  val Warning = 300
  val Error = 400
  val Critical = 500
  val Alert = 550
  val Emergency = 600

  /** The reference's shipped verbosity policy
    * (`ex/component_config/loggerConfiguration.json`): user-facing levels
    * normal, warnings/errors verbose, crashes camouflaged.
    */
  val defaultVerbosity: Map[Int, String] = Map(
    Debug -> "normal", Info -> "normal", Notice -> "normal",
    Warning -> "verbose", Error -> "verbose",
    Critical -> "camouflage", Alert -> "camouflage", Emergency -> "camouflage")

  /** monolog -> syslog severity (GELF's `level` field). */
  def syslogSeverity(monolog: Int): Int = monolog match {
    case Debug => 7
    case Info => 6
    case Notice => 5
    case Warning => 4
    case Error => 3
    case Critical => 2
    case Alert => 1
    case Emergency => 0
    case l if l < Info => 7
    case l if l < Warning => 6
    case l if l < Error => 4
    case _ => 3
  }

  /** Build from the platform-injected environment: `KBC_LOGGER_ADDR` /
    * `KBC_LOGGER_PORT` select the endpoint, `KBC_LOGGER_TYPE` (when set to
    * `udp`) selects the transport — the env-side surface of the
    * `gelf_server_type` logger configuration. Returns None when the
    * platform did not request GELF — callers fall back to plain stderr
    * logging.
    */
  def fromEnv(env: Map[String, String]): Option[GelfLogger] =
    for {
      addr <- env.get("KBC_LOGGER_ADDR")
      port <- env.get("KBC_LOGGER_PORT").flatMap(_.toIntOption)
    } yield new GelfLogger(addr, port,
      env.get("KBC_LOGGER_TYPE").map(_.toLowerCase).getOrElse("tcp"))
}
