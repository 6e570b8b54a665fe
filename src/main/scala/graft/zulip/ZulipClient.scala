package graft.zulip

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64

/** Outgoing Zulip message poster (reference `src/zulip/web.rs:11-53`).
  *
  * POSTs `type=stream&to=<stream>&subject=<topic>&content=<text>` as a
  * form-encoded body to `<base>/api/v1/messages` with HTTP Basic auth
  * (`base64(botId:botToken)`), exactly the wire shape the reference emits.
  *
  * `baseUrl` defaults to `https://<conf.zulipUrl>` (web.rs builds the same);
  * tests inject `http://localhost:<port>`. Errors are logged, not thrown —
  * the reference fire-and-forgets (`map_err(println)`); a moderation notify
  * must never take the pipeline down.
  */
final class ZulipClient(conf: ZulipConf, baseUrlOverride: Option[String] = None) {

  private val base = baseUrlOverride.getOrElse(s"https://${conf.zulipUrl}")
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  private[zulip] def authHeader: String =
    "Basic " + Base64.getEncoder.encodeToString(
      (conf.zulipBotId + ":" + conf.zulipBotToken).getBytes(StandardCharsets.UTF_8))

  private def enc(s: String): String = URLEncoder.encode(s, StandardCharsets.UTF_8)

  /** Post one stream message; returns the HTTP status, or -1 on transport
    * failure (logged). */
  def postMessage(text: String, stream: String, topic: String): Int = {
    val body = s"type=stream&to=${enc(stream)}&subject=${enc(topic)}&content=${enc(text)}"
    val req = HttpRequest.newBuilder(URI.create(s"$base/api/v1/messages"))
      .timeout(Duration.ofSeconds(30))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Authorization", authHeader)
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    try http.send(req, HttpResponse.BodyHandlers.ofString()).statusCode()
    catch {
      case e: Exception =>
        System.err.println(s"Error in postMessage: ${e.getMessage}")
        -1
    }
  }

  /** The three destinations the reference wires (eventhandler args). */
  def notify(text: String): Int = postMessage(text, conf.zulipNotifyStream, conf.zulipNotifyTopic)
  def log(text: String): Int = postMessage(text, conf.zulipLogStream, conf.zulipLogTopic)
  def commandReply(text: String): Int =
    postMessage(text, conf.zulipCommandStream, conf.zulipCommandTopic)

  private[zulip] def postForm(path: String, body: String): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(URI.create(s"$base$path"))
      .timeout(Duration.ofSeconds(30))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Authorization", authHeader)
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    http.send(req, HttpResponse.BodyHandlers.ofString())
  }

  private[zulip] def get(pathAndQuery: String): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(URI.create(s"$base$pathAndQuery"))
      .timeout(Duration.ofSeconds(90)) // long poll: Zulip holds the request open
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Authorization", authHeader)
      .GET()
      .build()
    http.send(req, HttpResponse.BodyHandlers.ofString())
  }
}
