package graft.commands

/** The operator command DSL (SURVEY §2a #17; reference zulip/command.rs).
  *
  * Grammar (command.rs:10-19, 52-237):
  *   status
  *   namechk <username>
  *   signup seen <username>
  *   signup rules test `<json>`   (command.rs:227 — `test` is a RULES
  *                                 subcommand, not a top-level signup form)
  *   signup rules list
  *   signup rules add <name> if|if_susp_ip|if_ip_susp <field> <check> <value>
  *     then <action>[+<action>…] [nodelay] [noexpiry]
  *   signup rules show|remove <name>
  *   signup rules disable-re|enable-re <pattern>
  *   signup rules renew <name> <Nd|Nw>
  *
  * Lua criteria arrive in backticks; the reference splices the code out and
  * substitutes a `$ $` placeholder before whitespace-splitting
  * (command.rs:53-62) — reproduced verbatim so arg positions match.
  */
object CommandParser {

  final case class Parsed(
      ok: Boolean,
      kind: String,
      name: Option[String] = None,
      field: Option[String] = None,
      check: Option[String] = None,
      value: Option[String] = None,
      actions: Option[String] = None,
      noDelay: Option[Boolean] = None,
      suspOnly: Option[Boolean] = None,
      expiryDays: Option[Int] = None,
      error: Option[String] = None)

  private val knownActions =
    Set("shadowban", "engine", "boost", "ipban", "close", "alt", "panic", "notify")

  private def err(msg: String = "Could not parse user command"): Parsed =
    Parsed(ok = false, kind = "error", error = Some(msg))

  def parse(command: String): Parsed = {
    val parts = command.split(" ", -1).toSeq
    parts.headOption match {
      case Some("status") => Parsed(ok = true, kind = "status")
      case Some("namechk") =>
        parts.lift(1).filter(_.nonEmpty) match {
          case Some(u) => Parsed(ok = true, kind = "namechk", name = Some(u))
          case None => err("Please provide a username")
        }
      case Some("signup") => parseSignup(command)
      case _ => err()
    }
  }

  private def parseSignup(command: String): Parsed = {
    // Backtick splice (command.rs:53-62).
    val firstSplit = command.split("`", -1)
    val (code, joined) =
      if (firstSplit.length > 2)
        (firstSplit(1),
          Seq(firstSplit(0).trim, "$ $", firstSplit(2).trim).mkString(" "))
      else ("", command)
    val args = joined.split(" ").toSeq.drop(1)

    args.headOption match {
      case Some("seen") =>
        args.lift(1) match {
          case Some(u) => Parsed(ok = true, kind = "seen", name = Some(u))
          case None => err()
        }
      case Some("rules") => parseRules(args, code)
      case _ => err()
    }
  }

  private def parseRules(args: Seq[String], code: String): Parsed =
    args.lift(1) match {
      case Some("list") => Parsed(ok = true, kind = "list")
      case Some("show") => withName(args, "show")
      case Some("remove") => withName(args, "remove")
      case Some("disable-re") => withName(args, "disable_re")
      case Some("enable-re") => withName(args, "enable_re")
      case Some("test") =>
        if (code.nonEmpty) Parsed(ok = true, kind = "test", value = Some(code))
        else err("Can't (de)serialize")
      case Some("renew") =>
        (args.lift(2), args.lift(3)) match {
          case (Some(name), Some(dur)) =>
            parseExpiryDuration(dur) match {
              case Right(days) =>
                Parsed(ok = true, kind = "renew", name = Some(name), expiryDays = Some(days))
              case Left(msg) => err(msg)
            }
          case (None, _) => err("Please provide a rule name")
          case (_, None) => err("Please provide a new expiry")
        }
      case Some("add") => parseAdd(args, code)
      case _ => err()
    }

  private def withName(args: Seq[String], kind: String): Parsed =
    args.lift(2) match {
      case Some(n) => Parsed(ok = true, kind = kind, name = Some(n))
      case None => err()
    }

  private def parseAdd(args: Seq[String], code: String): Parsed = {
    val suspIp = args.lift(3).exists(a => a == "if_susp_ip" || a == "if_ip_susp")
    if (!(args.lift(3).contains("if") || suspIp) || !args.lift(7).contains("then"))
      return err()
    val name = args.lift(2).getOrElse(return err())
    val element = args.lift(4).getOrElse(return err())
    val check = args.lift(5).getOrElse(return err())
    val value = args.lift(6).getOrElse(return err())

    // Criterion validation (command.rs:92-118).
    val criterion: Either[String, (String, String, String)] = element match {
      case "ip" if check == "equals" => Right(("ip", "equals", value))
      case "ip" => Left("Could not parse user command")
      case "print" => Left("Use lichess print ban instead")
      case "email" if check == "contains" || check == "regex" => Right(("email", check, value))
      case "email" => Left("Could not parse user command")
      case "username" if check == "contains" || check == "regex" => Right(("username", check, value))
      case "username" => Left("Could not parse user command")
      case "useragent" if check == "length-lte" =>
        value.toIntOption match {
          case Some(_) => Right(("useragent", "length-lte", value))
          case None => Left("Can't parse int")
        }
      case "useragent" => Left("Could not parse user command")
      // empty code = the operator forgot the backticks. The reference
      // accepts the add and fails when the lua compiles ("Invalid lua",
      // command.rs:298-300); the engine's analog (sqlCriterion("") →
      // plan-time ParseException) would detonate far from the command, so
      // validation is pulled forward to the same user-visible message
      case "lua" if code.nonEmpty => Right(("lua", "lua", code))
      case "lua" => Left("Invalid lua")
      case _ => Left("Could not parse user command")
    }
    criterion match {
      case Left(msg) => err(msg)
      case Right((f, c, v)) =>
        val actionsTok = args.lift(8).getOrElse(return err())
        val toks = actionsTok.split("\\+", -1).toSeq
        if (!toks.forall(knownActions.contains)) return err()
        val noDelay = args.lift(9).contains("nodelay")
        val expiryIdx = if (noDelay) 10 else 9
        val noExpiry = args.lift(expiryIdx).contains("noexpiry")
        // Default expiry: 182 days (command.rs:146-158).
        val expiryDays = if (noExpiry) None else Some(182)
        Parsed(ok = true, kind = "add", name = Some(name), field = Some(f),
          check = Some(c), value = Some(v), actions = Some(toks.mkString("+")),
          noDelay = Some(noDelay), suspOnly = Some(suspIp), expiryDays = expiryDays)
    }
  }

  /** A successful `add` → the engine's rule row (the reference constructs a
    * `Rule` from the parsed command, command.rs:119-166). Lua criteria go
    * through `RuleEngine.sqlCriterion` instead, so they return None here. */
  def toRuleRow(p: Parsed, nowUs: Long): Option[graft.rules.RuleRow] = {
    if (!p.ok || p.kind != "add" || p.field.contains("lua")) return None
    val kind = (p.field.get, p.check.get) match {
      case ("ip", "equals") => "ip_match"
      case ("email", "contains") => "email_contains"
      case ("email", "regex") => "email_regex"
      case ("username", "contains") => "username_contains"
      case ("username", "regex") => "username_regex"
      case ("useragent", "length-lte") => "ua_len_lte"
      case _ => return None
    }
    Some(graft.rules.RuleRow(
      name = p.name.get,
      kind = kind,
      pattern = if (kind == "ua_len_lte") "" else p.value.get,
      numArg = if (kind == "ua_len_lte") p.value.get.toInt else 0,
      enabled = true,
      suspOnly = p.suspOnly.getOrElse(false),
      noDelay = p.noDelay.getOrElse(false),
      expiryUs = p.expiryDays.map(d => nowUs + d.toLong * 86400L * 1000000L),
      actions = p.actions.get))
  }

  /** `Nd` / `Nw` → days (command.rs:243-263). */
  /** 100M days ≈ 273 000 years — far under the ~106.75M-day bound where
    * `days · 86 400 000 000` micros exceeds Long.MaxValue. */
  val maxExpiryDays = 100000000L

  def parseExpiryDuration(s: String): Either[String, Int] = {
    val step = s.lastOption.getOrElse('/')
    val amount = s.dropRight(1).toIntOption.getOrElse(0)
    // <= 0 also rejects negatives — the reference parses u32, so "-5d" is
    // an error there, not an already-expired rule. The week multiply runs
    // in Long, and the accepted range is capped so the downstream
    // `nowUs + days · 86 400 000 000` micros conversion can never wrap
    // Long either (wrap = negative = silently-already-expired rule)
    val days = if (step == 'd') amount.toLong else amount.toLong * 7
    if (amount <= 0 || (step != 'd' && step != 'w') || days > maxExpiryDays)
      Left("Invalid expiry date format. Example: `14d`. Supported: `d` (day), `w` (week).")
    else Right(days.toInt)
  }
}
