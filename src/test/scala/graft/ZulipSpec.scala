package graft

import java.io.File
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.zulip.{ZulipClient, ZulipConf, ZulipRtm, ZulipSupervisor}

/** Exercises the Zulip transport (reference zulip/rtm.rs + zulip/web.rs)
  * against a live local fake Zulip API: register → queue id, long-poll
  * event dispatch with ping/stream/topic addressing, reply posting with
  * the reference's exact wire shape, and liveness pings. */
class ZulipSpec extends AnyFunSuite {

  private def conf(port: Int) = ZulipConf.default.copy(
    zulipBotToken = "tok123",
    zulipBotId = "bot@example.org",
    zulipBotUsername = "graftbot",
    zulipCommandStream = "cmd-stream",
    zulipCommandTopic = "cmd-topic",
    zulipNotifyStream = "notify-stream",
    zulipNotifyTopic = "notify-topic",
    zulipUrl = s"localhost:$port")

  private val expectedAuth = "Basic " + java.util.Base64.getEncoder.encodeToString(
    "bot@example.org:tok123".getBytes(StandardCharsets.UTF_8))

  private def respond(ex: HttpExchange, body: String, status: Int = 200): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.getResponseBody.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  test("ZulipConf loads the reference's conf keys with placeholder fallback") {
    val f = File.createTempFile("zulip", ".conf")
    f.deleteOnExit()
    Files.write(f.toPath,
      """zulip_url = zulip.example.org
        |zulip_bot_token = t0k
        |zulip_bot_username = modbot
        |zulip_command_stream = mods
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val c = ZulipConf.load(f.getAbsolutePath)
    assert(c.zulipUrl == "zulip.example.org")
    assert(c.zulipBotToken == "t0k")
    assert(c.botPing == "@**modbot** ")
    assert(c.zulipCommandStream == "mods")
    // absent keys keep conf.rs.default's placeholders
    assert(c.rulesPath == "rules/rules.json")
    assert(c.zulipNotifyTopic == "Zulip topic in notify stream")
  }

  test("postMessage emits the reference wire shape (web.rs:29-47)") {
    val seen = new ConcurrentLinkedQueue[(String, String)]()
    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/api/v1/messages", (ex: HttpExchange) => {
      try {
        seen.add((ex.getRequestHeaders.getFirst("Authorization"), readBody(ex)))
        respond(ex, """{"result":"success"}""")
      } finally ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val c = conf(port)
      val client = new ZulipClient(c, Some(s"http://localhost:$port"))
      val status = client.notify("hello world & <you>")
      assert(status == 200)
      val (auth, body) = seen.poll()
      assert(auth == expectedAuth)
      assert(body ==
        "type=stream&to=notify-stream&subject=notify-topic&content=hello+world+%26+%3Cyou%3E")
    } finally server.stop(0)
  }

  test("RTM loop: register, dispatch addressed commands, reply, ping, advance watermark") {
    val polls = new AtomicInteger(0)
    val lastEventIds = new ConcurrentLinkedQueue[String]()
    val registers = new ConcurrentLinkedQueue[(String, String)]()
    val posted = new ConcurrentLinkedQueue[String]()
    val pings = new AtomicInteger(0)

    def msg(id: Int, content: String, stream: String, topic: String): String =
      s"""{"id":$id,"type":"message","message":{"content":"$content","display_recipient":"$stream","subject":"$topic"}}"""

    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/api/v1/register", (ex: HttpExchange) => {
      try {
        registers.add((ex.getRequestHeaders.getFirst("Authorization"), readBody(ex)))
        respond(ex, """{"result":"success","queue_id":"q-77"}""")
      } finally ex.close()
    })
    server.createContext("/api/v1/events", (ex: HttpExchange) => {
      try {
        assert(ex.getRequestHeaders.getFirst("Authorization") == expectedAuth)
        val query = Option(ex.getRequestURI.getQuery).getOrElse("")
        assert(query.contains("queue_id=q-77"))
        query.split("&").find(_.startsWith("last_event_id=")).foreach(lastEventIds.add)
        val batch = polls.incrementAndGet() match {
          case 1 => Seq(
            // addressed: dispatched
            msg(1, "@**graftbot** status", "cmd-stream", "cmd-topic"),
            // wrong topic: ignored but still a liveness ping (rtm.rs:163-166)
            msg(2, "@**graftbot** status", "cmd-stream", "other-topic"),
            """{"id":3,"type":"heartbeat"}""")
          case 2 => Seq(
            // addressed but unparseable: error message becomes the reply
            msg(4, "@**graftbot** gibberish", "cmd-stream", "cmd-topic"))
          case _ => Seq.empty
        }
        respond(ex, s"""{"result":"success","events":[${batch.mkString(",")}]}""")
      } finally ex.close()
    })
    server.createContext("/api/v1/messages", (ex: HttpExchange) => {
      try {
        assert(ex.getRequestHeaders.getFirst("Authorization") == expectedAuth)
        posted.add(readBody(ex))
        respond(ex, """{"result":"success"}""")
      } finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try {
      val port = server.getAddress.getPort
      val c = conf(port)
      val client = new ZulipClient(c, Some(s"http://localhost:$port"))
      val handler = ZulipRtm.parseOrError { parsed =>
        if (parsed.kind == "status") Some("stream alive") else None
      }
      val rtm = new ZulipRtm(c, client, handler, onPing = () => { pings.incrementAndGet(); () })
      val stop = new AtomicBoolean(false)
      rtm.start(stop)

      val deadline = System.currentTimeMillis() + 20000
      while (posted.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      // let at least one empty poll go through so the watermark after id=4 is visible
      while (polls.get() < 3 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      stop.set(true)

      val (regAuth, regBody) = registers.poll()
      assert(regAuth == expectedAuth)
      assert(regBody == "event_types=[\"message\"]")

      val replies = posted.toArray(Array.empty[String]).toSeq
      assert(replies.size == 2, s"got $replies")
      assert(replies(0) ==
        "type=stream&to=cmd-stream&subject=cmd-topic&content=stream+alive")
      assert(replies(1).contains("content=Could+not+parse+user+command"))

      // watermark: starts at -1 (rtm.rs:73), then the max seen event id
      val ids = lastEventIds.toArray(Array.empty[String]).toSeq.take(3)
      assert(ids == Seq("last_event_id=-1", "last_event_id=3", "last_event_id=4"))

      // pings: 2 messages + 1 heartbeat in batch 1, 1 message in batch 2
      assert(pings.get() == 4)
    } finally server.stop(0)
  }

  test("supervisor restarts a silent connection with a fresh register (status.rs:47-66)") {
    val registers = new AtomicInteger(0)
    val pings = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/api/v1/register", (ex: HttpExchange) => {
      try {
        val n = registers.incrementAndGet()
        respond(ex, s"""{"result":"success","queue_id":"q-$n"}""")
      } finally ex.close()
    })
    val heartbeatServed = new AtomicBoolean(false)
    server.createContext("/api/v1/events", (ex: HttpExchange) => {
      try {
        val query = Option(ex.getRequestURI.getQuery).getOrElse("")
        // the FIRST connection heartbeats once, then the feed goes silent
        // (success responses keep coming — silence is no EVENTS, the case
        // a transport-level liveness check cannot see)
        val batch =
          if (query.contains("queue_id=q-1") && heartbeatServed.compareAndSet(false, true))
            """{"id":1,"type":"heartbeat"}"""
          else { Thread.sleep(30); "" }
        respond(ex, s"""{"result":"success","events":[$batch]}""")
      } finally ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try {
      val port = server.getAddress.getPort
      val c = conf(port)
      val client = new ZulipClient(c, Some(s"http://localhost:$port"))
      val sup = new ZulipSupervisor(c, client, _ => None,
        onPing = () => { pings.incrementAndGet(); () },
        silenceRestartMs = 400L, checkMs = 60L)
      val stop = new AtomicBoolean(false)
      sup.start(stop)
      val deadline = System.currentTimeMillis() + 15000
      while (registers.get() < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      stop.set(true)
      assert(pings.get() >= 1, "the first connection must have delivered its heartbeat")
      assert(sup.restartCount >= 1, "silence past the window must restart the connection")
      assert(registers.get() >= 2, "a restart is a fresh register, not a resumed queue")
    } finally server.stop(0)
  }

  test("register without a queue id fails loudly (rtm.rs:66-68)") {
    val server = HttpServer.create(new InetSocketAddress("localhost", 0), 0)
    server.createContext("/api/v1/register", (ex: HttpExchange) => {
      try respond(ex, """{"result":"error"}""") finally ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val c = conf(port)
      val client = new ZulipClient(c, Some(s"http://localhost:$port"))
      val rtm = new ZulipRtm(c, client, _ => None)
      assertThrows[IllegalStateException](rtm.register())
    } finally server.stop(0)
  }
}
