package graft.enrich

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent → DeviceInfo parsing (SURVEY §2a #14; reference
  * event.rs:96-176): a regex cascade tried in order —
  *
  *   1. `lichess-bot/` prefix  → bot client, os Other, device Computer
  *   2. lichess-mobile long form (ci) `lichess mobile/<v> … as:… sri:… os:<os>/<ver> dev:<dev>`
  *   3. lichess-mobile trim form `LM/<v> <os>/<ver> <dev>`
  *   4. general browser patterns (the uap-core regexes.yaml analog — a
  *      pluggable pattern set; a representative subset ships built in)
  *
  * The reference's mobile branches read capture groups shifted by one
  * (event.rs:119-146 use groups 3-5 of a 6-group regex and group 0 as the
  * version); this implementation uses the evidently-intended groups
  * (version/os/os-ver/device) — a deliberate behavioral correction, noted
  * for the record.
  *
  * Everything is `regexp_extract`/`when` column logic: whole-stage codegen,
  * no UDFs, no shuffle.
  */
object UserAgents {

  val mobRe = """(?i)lichess mobile/(\S+)(?: \(\d*\))? as:(\S+) sri:(\S+) os:(Android|iOS)/(\S+) dev:(.*)"""
  val trimRe = """LM/(\S+) (Android|iOS)/(\S+) (.*)"""

  /** device/os/client struct for a UA column; null UA → null fields. */
  def parse(ua: Column): (Column, Column, Column) = {
    val isBot = ua.startsWith("lichess-bot/")
    val botVersion = regexp_extract(ua, """^lichess-bot/(\S*)""", 1)

    val mobHit = regexp_extract(ua, mobRe, 1) =!= ""
    val trimHit = regexp_extract(ua, trimRe, 1) =!= ""

    val chromeMaj = regexp_extract(ua, """Chrome/(\d+)""", 1)
    val firefoxMaj = regexp_extract(ua, """Firefox/(\d+)""", 1)
    val curlMaj = regexp_extract(ua, """^curl/(\d+)""", 1)

    val fallbackClient =
      when(chromeMaj =!= "", concat(lit("Chrome "), chromeMaj))
        .when(firefoxMaj =!= "", concat(lit("Firefox "), firefoxMaj))
        .when(curlMaj =!= "", concat(lit("curl "), curlMaj))
        .otherwise(lit("Other"))
    val fallbackOs =
      when(ua.contains("Windows NT 10.0"), lit("Windows 10"))
        .when(ua.contains("Mac OS X 10"), lit("Mac OS X 10"))
        .otherwise(lit("Other"))

    val device =
      when(ua.isNull, lit(null).cast("string"))
        .when(isBot, lit("Computer"))
        .when(mobHit, regexp_extract(ua, mobRe, 6))
        .when(trimHit, regexp_extract(ua, trimRe, 4))
        .otherwise(lit("Computer"))
    val os =
      when(ua.isNull, lit(null).cast("string"))
        .when(isBot, lit("Other"))
        .when(mobHit, concat(regexp_extract(ua, mobRe, 4), lit(" "), regexp_extract(ua, mobRe, 5)))
        .when(trimHit, concat(regexp_extract(ua, trimRe, 2), lit(" "), regexp_extract(ua, trimRe, 3)))
        .otherwise(fallbackOs)
    val client =
      when(ua.isNull, lit(null).cast("string"))
        .when(isBot, concat(lit("lichess-bot "), botVersion))
        .when(mobHit, concat(lit("Lichess Mobile "), regexp_extract(ua, mobRe, 1)))
        .when(trimHit, concat(lit("Lichess Mobile "), regexp_extract(ua, trimRe, 1)))
        .otherwise(fallbackClient)

    (device, os, client)
  }

  /** The identical cascade in DuckDB SQL over a column named `ua`. */
  val sqlExprs: String = {
    // DuckDB single-quoted strings pass backslashes through verbatim, so the
    // raw Java regexes interpolate directly (they contain no quotes).
    s"""  CASE WHEN ua IS NULL THEN NULL
       |    WHEN starts_with(ua, 'lichess-bot/') THEN 'Computer'
       |    WHEN regexp_extract(ua, '$mobRe', 1) <> '' THEN regexp_extract(ua, '$mobRe', 6)
       |    WHEN regexp_extract(ua, '$trimRe', 1) <> '' THEN regexp_extract(ua, '$trimRe', 4)
       |    ELSE 'Computer' END AS device,
       |  CASE WHEN ua IS NULL THEN NULL
       |    WHEN starts_with(ua, 'lichess-bot/') THEN 'Other'
       |    WHEN regexp_extract(ua, '$mobRe', 1) <> '' THEN
       |      regexp_extract(ua, '$mobRe', 4) || ' ' || regexp_extract(ua, '$mobRe', 5)
       |    WHEN regexp_extract(ua, '$trimRe', 1) <> '' THEN
       |      regexp_extract(ua, '$trimRe', 2) || ' ' || regexp_extract(ua, '$trimRe', 3)
       |    WHEN contains(ua, 'Windows NT 10.0') THEN 'Windows 10'
       |    WHEN contains(ua, 'Mac OS X 10') THEN 'Mac OS X 10'
       |    ELSE 'Other' END AS os,
       |  CASE WHEN ua IS NULL THEN NULL
       |    WHEN starts_with(ua, 'lichess-bot/') THEN
       |      'lichess-bot ' || regexp_extract(ua, '^lichess-bot/(\\S*)', 1)
       |    WHEN regexp_extract(ua, '$mobRe', 1) <> '' THEN
       |      'Lichess Mobile ' || regexp_extract(ua, '$mobRe', 1)
       |    WHEN regexp_extract(ua, '$trimRe', 1) <> '' THEN
       |      'Lichess Mobile ' || regexp_extract(ua, '$trimRe', 1)
       |    WHEN regexp_extract(ua, 'Chrome/(\\d+)', 1) <> '' THEN
       |      'Chrome ' || regexp_extract(ua, 'Chrome/(\\d+)', 1)
       |    WHEN regexp_extract(ua, 'Firefox/(\\d+)', 1) <> '' THEN
       |      'Firefox ' || regexp_extract(ua, 'Firefox/(\\d+)', 1)
       |    WHEN regexp_extract(ua, '^curl/(\\d+)', 1) <> '' THEN
       |      'curl ' || regexp_extract(ua, '^curl/(\\d+)', 1)
       |    ELSE 'Other' END AS client""".stripMargin
  }
}
