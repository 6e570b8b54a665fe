package graft.events

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic signup-user derivation over the `events` table.
  *
  * The reference consumes signup events carrying `{username, email, ip,
  * userAgent, fingerPrint, suspIp}` (event.rs:40-50). The driver's synthetic
  * `events` table has no such payload, so the engine derives one — pure,
  * portable column arithmetic (identical formulas in the DuckDB oracle CTE)
  * so every downstream rule/enrichment operator is hash-checkable.
  *
  * Octet/derivation formulas use only `event_id`/`user_id` so they are
  * deterministic at every scale factor.
  */
object Signups {

  /** UA variants cycle on event_id % 7:
    * 0 lichess-bot, 1 lichess-mobile (long form), 2 lichess-mobile (trim
    * form), 3 Chrome, 4 Firefox, 5 no UA (null), 6 curl (short). */
  def derive(events: DataFrame): DataFrame = {
    val e = events.filter(col("event_type") === "signup")
    val uid = col("user_id")
    val eid = col("event_id")
    e.select(
      eid.as("event_id"),
      col("ts"),
      unix_micros(col("ts")).as("ts_us"),
      concat(lit("user_"), uid).as("username"),
      concat(lit("user_"), uid, lit("@mail"), uid % 5, lit(".example")).as("email"),
      concat_ws(".",
        (eid % 224).cast("string"),
        (expr("event_id DIV 224") % 256).cast("string"),
        ((eid * 7) % 256).cast("string"),
        ((eid * 13) % 256).cast("string")).as("ip"),
      md5(concat(lit("fp"), (uid % 50))).as("fingerprint"),
      (eid % 10 === 0).as("susp_ip"),
      when(eid % 7 === 0, concat(lit("lichess-bot/1."), uid % 3, lit(".0 rating:2000")))
        .when(eid % 7 === 1, concat(lit("Lichess Mobile/8."), uid % 10,
          lit(".0 as:anon sri:s"), eid % 1000, lit(" os:Android/"), uid % 14,
          lit(" dev:Pixel "), uid % 9))
        .when(eid % 7 === 2, concat(lit("LM/8."), uid % 10, lit(" iOS/"), uid % 17,
          lit(" iPhone"), uid % 12))
        .when(eid % 7 === 3, concat(lit("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/1"),
          uid % 30, lit(".0 Safari/537.36")))
        .when(eid % 7 === 4, concat(lit("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Firefox/"),
          uid % 20, lit(".0")))
        .when(eid % 7 === 5, lit(null).cast("string"))
        .otherwise(concat(lit("curl/7."), uid % 88))
        .as("ua"))
  }

  def derive(spark: SparkSession, sfDir: String): DataFrame =
    derive(Tables(spark, sfDir).events)

  /** The identical derivation as a DuckDB CTE named `signups`; every rule
    * oracle starts with this prefix. [[cte]] is the composable form
    * (no WITH keyword) for oracles that add further CTEs. */
  val sqlCte: String =
    """WITH signups AS (
      |  SELECT event_id,
      |    CAST(ts AS TIMESTAMP) AS ts,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |    'user_' || user_id AS username,
      |    'user_' || user_id || '@mail' || (user_id % 5) || '.example' AS email,
      |    (event_id % 224) || '.' || ((event_id // 224) % 256) || '.' ||
      |      ((event_id * 7) % 256) || '.' || ((event_id * 13) % 256) AS ip,
      |    md5('fp' || (user_id % 50)) AS fingerprint,
      |    (event_id % 10 = 0) AS susp_ip,
      |    CASE event_id % 7
      |      WHEN 0 THEN 'lichess-bot/1.' || (user_id % 3) || '.0 rating:2000'
      |      WHEN 1 THEN 'Lichess Mobile/8.' || (user_id % 10) || '.0 as:anon sri:s' ||
      |        (event_id % 1000) || ' os:Android/' || (user_id % 14) || ' dev:Pixel ' || (user_id % 9)
      |      WHEN 2 THEN 'LM/8.' || (user_id % 10) || ' iOS/' || (user_id % 17) || ' iPhone' || (user_id % 12)
      |      WHEN 3 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/1' ||
      |        (user_id % 30) || '.0 Safari/537.36'
      |      WHEN 4 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Firefox/' || (user_id % 20) || '.0'
      |      WHEN 5 THEN NULL
      |      ELSE 'curl/7.' || (user_id % 88)
      |    END AS ua
      |  FROM events
      |  WHERE event_type = 'signup'
      |)
      |""".stripMargin

  val cte: String = sqlCte.stripPrefix("WITH ")
}
