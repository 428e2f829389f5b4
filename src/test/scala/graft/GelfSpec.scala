package graft

import java.net.{DatagramPacket, DatagramSocket, ServerSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.collection.mutable.ArrayBuffer

import graft.logging.GelfLogger

/** C9 GELF logging: TCP null-terminated frames, UDP datagrams, the
  * verbosity policy (normal / verbose / camouflage), and the
  * ComponentMain wiring from platform env vars.
  */
class GelfSpec extends SparkSpec {

  /** Collect null-terminated frames from one TCP connection. */
  private def tcpCapture(expect: Int): (ServerSocket, ArrayBuffer[String], CountDownLatch) = {
    val server = new ServerSocket(0)
    val frames = ArrayBuffer.empty[String]
    val latch = new CountDownLatch(expect)
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val in = sock.getInputStream
        val buf = new ArrayBuffer[Byte]()
        var b = in.read()
        while (b != -1 && latch.getCount > 0) {
          if (b == 0) {
            frames.synchronized {
              frames += new String(buf.toArray, StandardCharsets.UTF_8)
            }
            buf.clear()
            latch.countDown()
          } else buf += b.toByte
          b = in.read()
        }
      } catch { case _: Exception => () }
    })
    t.setDaemon(true)
    t.start()
    (server, frames, latch)
  }

  test("tcp frames carry GELF 1.1 JSON with syslog levels") {
    val (server, frames, latch) = tcpCapture(2)
    val log = new GelfLogger("127.0.0.1", server.getLocalPort, "tcp")
    try {
      log.info("hello world")
      log.debug("details", Map("snapshot" -> "7"))
      assert(latch.await(5, TimeUnit.SECONDS), "frames not received")
      val f = frames.synchronized(frames.toSeq)
      assert(f.head.contains("\"version\":\"1.1\""), f.head)
      assert(f.head.contains("\"short_message\":\"hello world\""), f.head)
      assert(f.head.contains("\"level\":6"), f.head) // INFO -> syslog 6
      assert(f(1).contains("\"level\":7"), f(1))     // DEBUG -> syslog 7
      assert(f(1).contains("\"_monolog_level\":100"), f(1))
    } finally { log.close(); server.close() }
  }

  test("verbosity policy: errors verbose with fields, crashes camouflaged") {
    val (server, frames, latch) = tcpCapture(2)
    val log = new GelfLogger("127.0.0.1", server.getLocalPort, "tcp")
    try {
      log.error("table lake.t missing", Map("namespace" -> "lake"))
      log.critical("NullPointerException at IceTable.scala:42")
      assert(latch.await(5, TimeUnit.SECONDS), "frames not received")
      val f = frames.synchronized(frames.toSeq)
      // error: verbose -> original text plus structured fields
      assert(f.head.contains("\"short_message\":\"table lake.t missing\""), f.head)
      assert(f.head.contains("\"_namespace\":\"lake\""), f.head)
      // critical: camouflage -> generic user text, original preserved
      assert(f(1).contains("Internal error occurred"), f(1))
      assert(!f(1).contains("\"short_message\":\"NullPointerException"), f(1))
      assert(f(1).contains("\"_original_message\":\"NullPointerException at IceTable.scala:42\""), f(1))
    } finally { log.close(); server.close() }
  }

  test("udp datagrams carry the same payload") {
    val sock = new DatagramSocket()
    val port = sock.getLocalPort
    // construct through the env surface: KBC_LOGGER_TYPE selects transport
    val log = GelfLogger.fromEnv(Map(
      "KBC_LOGGER_ADDR" -> "127.0.0.1",
      "KBC_LOGGER_PORT" -> port.toString,
      "KBC_LOGGER_TYPE" -> "udp")).get
    try {
      log.info("over udp")
      val pkt = new DatagramPacket(new Array[Byte](8192), 8192)
      sock.setSoTimeout(5000)
      sock.receive(pkt)
      val body = new String(pkt.getData, 0, pkt.getLength, StandardCharsets.UTF_8)
      assert(body.contains("\"short_message\":\"over udp\""), body)
    } finally { log.close(); sock.close() }
  }

  test("ComponentMain logs run lifecycle to the injected GELF endpoint") {
    val (server, frames, latch) = tcpCapture(2)
    try {
      val d = {
        val dir = scratch("gelf-run")
        Files.createDirectories(Paths.get(dir))
        dir
      }
      Files.writeString(Paths.get(d, "config.json"),
        s"""{"action": "list_namespaces",
           | "parameters": {"catalog": {"warehouse": "${scratch("gelf-wh")}"}}}""".stripMargin)
      val buf = new java.io.ByteArrayOutputStream()
      val code = Console.withOut(new java.io.PrintStream(buf)) {
        ComponentMain.execute(spark, d, env = Map(
          "KBC_LOGGER_ADDR" -> "127.0.0.1",
          "KBC_LOGGER_PORT" -> server.getLocalPort.toString))
      }
      assert(code == 0)
      assert(latch.await(5, TimeUnit.SECONDS), "lifecycle frames not received")
      val f = frames.synchronized(frames.toSeq)
      assert(f.head.contains("Running action 'list_namespaces'"), f.head)
      assert(f(1).contains("Component finished."), f(1))
    } finally server.close()
  }
}
