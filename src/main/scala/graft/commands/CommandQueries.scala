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

  // ---- command → rule → engine, end to end --------------------------------

  /** `signup rules add …` commands that should actually fire against the
    * signup corpus (the [[corpus]] adds are parse-shape fixtures; these are
    * live). */
  val execCorpus: Seq[String] = Seq(
    "signup rules add e_contains if username contains ER_1 then notify",
    "signup rules add e_regex if email regex ^user_1[0-9]*@ then close+notify",
    "signup rules add e_ua if useragent length-lte 12 then ipban nodelay",
    "signup rules add e_susp if_susp_ip username contains user then notify noexpiry",
    "signup rules add e_ip if ip equals 123.0.93.63 then close",
    "signup rules add e_cold if username contains zz_nobody then close")

  /** Compile parsed `add` commands into engine rules — delegates to the
    * parser's own [[CommandParser.toRuleRow]] (one command→rule compiler;
    * unmapped (field, check) pairs skip instead of throwing). Expiry
    * resolves against the fixed evaluation instant, as the reference
    * resolves against `Utc::now()`. */
  def rulesFromCommands(cmds: Seq[String]): Seq[graft.rules.RuleRow] =
    cmds.map(CommandParser.parse)
      .flatMap(p => CommandParser.toRuleRow(p, graft.rules.Rules.nowUs))

  /** End-to-end: DSL text → parsed rules → broadcast-join match counts per
    * rule (zero-match rules included — the operator sees every added rule).
    * This is the integration the reference runs continuously: a command
    * mutates the rule set, the very next event is evaluated under it. */
  def cmdExec(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val rules = graft.rules.Rules.dfFor(spark, rulesFromCommands(execCorpus))
    val signups = graft.events.Signups.derive(spark, sfDir)
    val counts = graft.rules.RuleEngine.matches(signups, rules)
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
    rules.select(col("name"), col("actions"))
      .join(counts, Seq("name"), "left")
      .select(col("name").as("rule_name"), col("actions"),
        coalesce(col("n"), lit(0L)).as("n_matches"))
  }

  val cmdExecSql: String = {
    import graft.rules.{RuleEngine, Rules}
    import graft.events.Signups
    "WITH " + Signups.cte.stripSuffix("\n") + ",\n" +
      Rules.valuesSqlFor(rulesFromCommands(execCorpus), "rules") + "\n" +
      s"""SELECT r.name AS rule_name, r.actions,
         |  count(s.event_id) AS n_matches
         |FROM rules r LEFT JOIN signups s ON ${RuleEngine.matchConditionSql()}
         |GROUP BY 1, 2""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cmd_parse" -> (cmdParse _),
    "cmd_exec" -> (cmdExec _))

  def oracleSql: Map[String, String] = Map(
    "cmd_parse" -> cmdParseSql,
    "cmd_exec" -> cmdExecSql)
}
