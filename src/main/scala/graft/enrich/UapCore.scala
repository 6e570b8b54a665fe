package graft.enrich

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** uap-core `regexes.yaml` loader (SURVEY §2a #14; reference
  * event.rs:148-176 falls back to the full UserAgentParser database for
  * non-lichess UAs).
  *
  * Parses the published uap-core file format — three parser lists
  * (`user_agent_parsers`, `os_parsers`, `device_parsers`), each item a
  * `regex` plus optional `*_replacement` templates — and compiles each list
  * into a first-match-wins `when()` cascade over `rlike`/`regexp_extract`:
  * the same pluggable-pattern shape as [[UserAgents]], but driven by the
  * real database instead of the built-in subset. Pure column logic —
  * whole-stage codegen, no UDFs, no shuffle; the dim is compiled into the
  * plan, so the event side scans exactly as before.
  *
  * The YAML subset implemented is what regexes.yaml actually uses: a
  * top-level `key:` per section, `- key: value` items, single- or
  * double-quoted scalars. (No anchors, no nesting beyond one level.)
  */
object UapCore {

  final case class Pattern(regex: String, replacement: Option[String],
      caseInsensitive: Boolean = false) {
    /** The Java-regex form: uap-core marks case-insensitivity out-of-band
      * (`regex_flag: 'i'`) — fold it back in as an inline flag. */
    def javaRegex: String = if (caseInsensitive) "(?i)" + regex else regex
  }
  final case class Db(clients: Seq[Pattern], os: Seq[Pattern], devices: Seq[Pattern])

  private val sectionKeys = Map(
    "user_agent_parsers" -> "family_replacement",
    "os_parsers" -> "os_replacement",
    "device_parsers" -> "device_replacement")

  /** Parse regexes.yaml content (pass `scala.io.Source.fromFile(...).mkString`
    * or any string of the same format — the dim file is driver-side config,
    * like the reference's parser database). */
  def parse(yaml: String): Db = {
    val sections = parseSections(yaml)
    def patterns(section: String): Seq[Pattern] = {
      val replKey = sectionKeys(section)
      sections.getOrElse(section, mutable.ListBuffer.empty).toSeq
        .flatMap(m => m.get("regex").map(r =>
          Pattern(r, m.get(replKey), m.get("regex_flag").contains("i"))))
    }
    Db(patterns("user_agent_parsers"), patterns("os_parsers"), patterns("device_parsers"))
  }

  /** uap-core test-fixture loader (`tests/test_device.yaml` /
    * `test_ua.yaml` format — same one-level YAML subset): the `test_cases`
    * items as key→value maps (`user_agent_string`, `family`, …), for
    * replaying the project's published conformance cases through the
    * compiled cascade. */
  def parseFixtures(yaml: String): Seq[Map[String, String]] =
    parseSections(yaml).getOrElse("test_cases", mutable.ListBuffer.empty)
      .toSeq.map(_.toMap)

  private def parseSections(
      yaml: String): mutable.Map[String, mutable.ListBuffer[mutable.Map[String, String]]] = {
    val sections = mutable.Map.empty[String, mutable.ListBuffer[mutable.Map[String, String]]]
    var current: String = ""
    var item: mutable.Map[String, String] = null
    yaml.linesIterator.foreach { raw =>
      // whole-line comments only: a '#' INSIDE a quoted regex is literal
      // (e.g. `- regex: '(Foo)#(\d+)'`), so mid-line stripping would
      // corrupt the pattern
      val line = if (raw.trim.startsWith("#")) "" else raw
      val trimmed = line.trim
      if (trimmed.nonEmpty) {
        if (!line.startsWith(" ") && trimmed.endsWith(":")) {
          current = trimmed.dropRight(1)
          sections.getOrElseUpdate(current, mutable.ListBuffer.empty)
          item = null
        } else if (trimmed.startsWith("- ")) {
          item = mutable.Map.empty
          sections.getOrElseUpdate(current, mutable.ListBuffer.empty) += item
          putKv(item, trimmed.drop(2))
        } else if (item != null) {
          putKv(item, trimmed)
        }
      }
    }
    sections
  }

  private def putKv(item: mutable.Map[String, String], kv: String): Unit = {
    val i = kv.indexOf(':')
    if (i > 0) {
      val k = kv.substring(0, i).trim
      item(k) = unquote(kv.substring(i + 1).trim)
    }
  }

  private def unquote(v: String): String =
    if (v.length >= 2 && v.head == '\'' && v.last == '\'')
      v.substring(1, v.length - 1).replace("''", "'")
    else if (v.length >= 2 && v.head == '"' && v.last == '"')
      v.substring(1, v.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
    else v

  /** First-match-wins family cascade: `replacement` template with `$1`-`$9`
    * substituted by the corresponding capture groups, else the raw
    * replacement, else group 1 — uap-core's documented resolution rule. A
    * null UA resolves to null (never the default — [[UserAgents.parse]]'s
    * null contract, which a dim-driven swap-in must preserve). */
  def family(ua: Column, patterns: Seq[Pattern], default: String = "Other"): Column =
    patterns match {
      case Seq() => when(ua.isNotNull, lit(default))
      case head +: tail =>
        // FLAT CaseWhen (chained .when appends branches) — a foldRight of
        // nested when/otherwise builds a tree as deep as the pattern list,
        // which overflows Catalyst recursion and the 64KB codegen method
        // limit on the real ~1000-entry regexes.yaml
        tail.foldLeft(when(ua.rlike(head.javaRegex), familyExpr(ua, head))) {
          (acc, p) => acc.when(ua.rlike(p.javaRegex), familyExpr(ua, p))
        }.when(ua.isNotNull, lit(default))
    }

  private val groupRef = "\\$([1-9])".r

  private def familyExpr(ua: Column, p: Pattern): Column = p.replacement match {
    case Some(t) if groupRef.findFirstIn(t).isDefined =>
      // split keeping the $N tokens: "LG $2" → ["LG ", "$2"]
      val tokens = groupRef.pattern.split(t, -1) // literal parts, keep trailing ""
      val refs = groupRef.findAllMatchIn(t).map(_.group(1).toInt).toSeq
      val pieces = tokens.zipWithIndex.flatMap { case (s, i) =>
        (if (i == 0) Seq.empty
         else Seq(regexp_extract(ua, p.javaRegex, refs(i - 1)))) ++
          (if (s.isEmpty) Seq.empty else Seq(lit(s)))
      }
      concat(pieces.toIndexedSeq: _*)
    case Some(t) => lit(t)
    // javaRegex (not raw regex) so a `regex_flag: 'i'` pattern extracts
    // with the same case-insensitivity the rlike match guard used —
    // otherwise the guard matches but the extract returns '' as the family
    case None => regexp_extract(ua, p.javaRegex, 1)
  }

  /** (device, os, client) columns from a loaded db — the dim-driven analog
    * of [[UserAgents.parse]]'s built-in fallback stage. */
  def parseColumns(ua: Column, db: Db): (Column, Column, Column) =
    (family(ua, db.devices), family(ua, db.os), family(ua, db.clients))
}
