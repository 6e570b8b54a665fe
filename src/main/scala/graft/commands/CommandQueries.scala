package graft.commands

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exposes the command parser over a fixed corpus as a DataFrame; the oracle
  * is a hand-verified VALUES literal (the parser has no relational input).
  */
object CommandQueries {

  val corpus: Seq[String] = Seq(
    "status",
    "namechk bob",
    "signup seen SomeUser",
    "signup rules list",
    "signup rules add myrule if username contains foo then close+notify",
    "signup rules add r2 if email regex ^a.*@x then shadowban nodelay",
    "signup rules add r3 if_susp_ip ip equals 1.2.3.4 then ipban noexpiry",
    "signup rules add r4 if useragent length-lte 20 then close nodelay noexpiry",
    "signup rules add bad1 if print equals abc then close",
    "signup rules add bad2 if username matches foo then close",
    "signup rules add bad3 if username contains foo then explode",
    "signup rules add lr if lua `user:name() == \"x\"` then close",
    "signup rules show r2",
    "signup rules remove r2",
    "signup rules disable-re ^tmp",
    "signup rules enable-re ^tmp",
    "signup rules renew r3 14d",
    "signup rules renew r3 2x",
    "signup rules renew r3 3w",
    "bogus command")

  def cmdParse(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (cmd, i) =>
      val p = CommandParser.parse(cmd)
      (i.toLong, p.ok, p.kind, p.name, p.field, p.check, p.value, p.actions,
        p.noDelay, p.suspOnly, p.expiryDays, p.error)
    }.toDF("cmd_id", "ok", "kind", "name", "field", "check", "value", "actions",
      "no_delay", "susp_only", "expiry_days", "error")
  }

  /** Expected outputs, derived by hand from command.rs semantics. */
  val cmdParseSql: String = {
    def s(v: String) = s"'$v'"
    val N = "NULL"
    val parseErr = s("Could not parse user command")
    val rows = Seq(
      // (id, ok, kind, name, field, check, value, actions, no_delay, susp_only, expiry_days, error)
      s"(0, true, 'status', $N, $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(1, true, 'namechk', 'bob', $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(2, true, 'seen', 'SomeUser', $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(3, true, 'list', $N, $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(4, true, 'add', 'myrule', 'username', 'contains', 'foo', 'close+notify', false, false, 182, $N)",
      s"(5, true, 'add', 'r2', 'email', 'regex', '^a.*@x', 'shadowban', true, false, 182, $N)",
      s"(6, true, 'add', 'r3', 'ip', 'equals', '1.2.3.4', 'ipban', false, true, $N, $N)",
      s"(7, true, 'add', 'r4', 'useragent', 'length-lte', '20', 'close', true, false, $N, $N)",
      s"(8, false, 'error', $N, $N, $N, $N, $N, $N, $N, $N, 'Use lichess print ban instead')",
      s"(9, false, 'error', $N, $N, $N, $N, $N, $N, $N, $N, $parseErr)",
      s"(10, false, 'error', $N, $N, $N, $N, $N, $N, $N, $N, $parseErr)",
      s"""(11, true, 'add', 'lr', 'lua', 'lua', 'user:name() == "x"', 'close', false, false, 182, $N)""",
      s"(12, true, 'show', 'r2', $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(13, true, 'remove', 'r2', $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(14, true, 'disable_re', '^tmp', $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(15, true, 'enable_re', '^tmp', $N, $N, $N, $N, $N, $N, $N, $N)",
      s"(16, true, 'renew', 'r3', $N, $N, $N, $N, $N, $N, 14, $N)",
      s"(17, false, 'error', $N, $N, $N, $N, $N, $N, $N, $N, 'Invalid expiry date format. Example: `14d`. Supported: `d` (day), `w` (week).')",
      s"(18, true, 'renew', 'r3', $N, $N, $N, $N, $N, $N, 21, $N)",
      s"(19, false, 'error', $N, $N, $N, $N, $N, $N, $N, $N, $parseErr)")
    s"""SELECT CAST(cmd_id AS BIGINT) AS cmd_id, ok, kind, name, field, "check", value, actions,
       |  no_delay, susp_only, CAST(expiry_days AS INTEGER) AS expiry_days, error
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")}
       |) t(cmd_id, ok, kind, name, field, "check", value, actions, no_delay, susp_only, expiry_days, error)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cmd_parse" -> (cmdParse _))

  def oracleSql: Map[String, String] = Map(
    "cmd_parse" -> cmdParseSql)
}
