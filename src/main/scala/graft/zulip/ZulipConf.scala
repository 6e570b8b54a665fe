package graft.zulip

import java.io.FileInputStream
import java.util.Properties

/** Deployment configuration for the Zulip transport (reference
  * `src/conf.rs.default`). The reference compiles its config in as Rust
  * constants; the Spark-side analog is a properties file with one key per
  * constant (lower-cased), loaded at process start.
  *
  * Only the transport cares about most of these; `token`/`rulesPath`/
  * `geoipDbPath`/`uapRegexesPath` are carried so one file configures the
  * whole program like the reference's single `conf` module does.
  */
final case class ZulipConf(
    token: String,
    rulesPath: String,
    geoipDbPath: String,
    uapRegexesPath: String,
    zulipBotToken: String,
    zulipBotId: String,
    zulipBotUsername: String,
    zulipCommandStream: String,
    zulipCommandTopic: String,
    zulipNotifyStream: String,
    zulipNotifyTopic: String,
    zulipLogStream: String,
    zulipLogTopic: String,
    zulipUrl: String) {

  /** The reference addresses commands at the bot with `@**name** cmd`
    * (rtm.rs:72). */
  def botPing: String = s"@**$zulipBotUsername** "
}

object ZulipConf {

  /** Defaults mirror conf.rs.default's placeholder values so a fresh file
    * behaves like a fresh reference checkout. */
  def default: ZulipConf = ZulipConf(
    token = "Lichess API token",
    rulesPath = "rules/rules.json",
    geoipDbPath = "GeoLite2-City.mmdb",
    uapRegexesPath = "uap-regexes.yaml",
    zulipBotToken = "Zulip bot token",
    zulipBotId = "Zulip bot ID (that email address thing)",
    zulipBotUsername = "Zulip bot username",
    zulipCommandStream = "Zulip command stream ID",
    zulipCommandTopic = "Zulip topic in command stream",
    zulipNotifyStream = "Zulip notify stream ID",
    zulipNotifyTopic = "Zulip topic in notify stream",
    zulipLogStream = "Zulip log stream ID",
    zulipLogTopic = "Zulip topic in log stream",
    zulipUrl = "Zulip instance URL")

  /** Load from a `key = value` properties file; any key absent falls back
    * to the default placeholder (the reference fails later, at use — same
    * here: a placeholder URL simply fails to connect). */
  def load(path: String): ZulipConf = {
    val props = new Properties()
    val in = new FileInputStream(path)
    try props.load(in) finally in.close()
    def get(key: String, dflt: String): String =
      Option(props.getProperty(key)).map(_.trim).filter(_.nonEmpty).getOrElse(dflt)
    val d = default
    ZulipConf(
      token = get("token", d.token),
      rulesPath = get("rules_path", d.rulesPath),
      geoipDbPath = get("geoip_db_path", d.geoipDbPath),
      uapRegexesPath = get("uap_regexes_path", d.uapRegexesPath),
      zulipBotToken = get("zulip_bot_token", d.zulipBotToken),
      zulipBotId = get("zulip_bot_id", d.zulipBotId),
      zulipBotUsername = get("zulip_bot_username", d.zulipBotUsername),
      zulipCommandStream = get("zulip_command_stream", d.zulipCommandStream),
      zulipCommandTopic = get("zulip_command_topic", d.zulipCommandTopic),
      zulipNotifyStream = get("zulip_notify_stream", d.zulipNotifyStream),
      zulipNotifyTopic = get("zulip_notify_topic", d.zulipNotifyTopic),
      zulipLogStream = get("zulip_log_stream", d.zulipLogStream),
      zulipLogTopic = get("zulip_log_topic", d.zulipLogTopic),
      zulipUrl = get("zulip_url", d.zulipUrl))
  }
}
