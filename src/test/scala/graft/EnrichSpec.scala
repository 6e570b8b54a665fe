package graft

import graft.commands.CommandParser
import org.scalatest.funsuite.AnyFunSuite

class EnrichSpec extends AnyFunSuite {
  import SparkTest._

  test("geo range join covers every in-range ip exactly once") {
    val df = enrich.EnrichQueries.geoIpRange(spark, sf)
    val total = df.count()
    val signups = events.Signups.derive(spark, sf).count()
    assert(total == signups, "left range join must not duplicate (ranges are disjoint)")
    assert(df.filter("country IS NULL").count() == 0, "all first octets < 224 are covered")
  }

  test("malformed ips enrich to null, never to an aliased range") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // "0.300.0.1" aliases into a valid range's integer space if octets
    // aren't validated; IPv6 and garbage must also fail closed
    val users = Seq((1L, "0.300.0.1"), (2L, "::1"), (3L, "garbage"),
      (4L, "1.2.3.4.5"), (5L, "10.0.0.1")).toDF("event_id", "ip")
    val out = enrich.GeoIp.enrich(users, enrich.GeoIp.rangesDf(spark))
      .select(col("event_id"), col("country")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty && out(3L).isEmpty && out(4L).isEmpty)
    assert(out(5L).nonEmpty)
    val fast = enrich.GeoIp.enrichFast(users, enrich.GeoIp.ranges)
      .select(col("event_id"), col("country")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fast == out)
  }

  test("ua cascade: bot / mobile / trim / fallback / null branches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val uas = Seq(
      "lichess-bot/1.2.0 rating:2000",
      "Lichess Mobile/8.3.0 as:anon sri:s12 os:Android/7 dev:Pixel 4",
      "LM/8.3 iOS/15 iPhone7",
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/115.0 Safari/537.36",
      null,
      "curl/7.33").toDF("ua")
    val (d, o, c) = enrich.UserAgents.parse(col("ua"))
    val rows = uas.select(d.as("d"), o.as("o"), c.as("c")).collect()
    assert(rows(0).getString(2) == "lichess-bot 1.2.0" && rows(0).getString(1) == "Other")
    assert(rows(1).getString(0) == "Pixel 4" && rows(1).getString(1) == "Android 7"
      && rows(1).getString(2) == "Lichess Mobile 8.3.0")
    assert(rows(2).getString(0) == "iPhone7" && rows(2).getString(1) == "iOS 15")
    assert(rows(3).getString(2) == "Chrome 115" && rows(3).getString(1) == "Windows 10")
    assert(rows(4).isNullAt(0) && rows(4).isNullAt(1) && rows(4).isNullAt(2))
    assert(rows(5).getString(2) == "curl 7")
  }

  test("seen_recent keeps at most the last 2000 signups") {
    val df = enrich.EnrichQueries.seenRecent(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("seen_count")).head.getLong(0)
    assert(total <= 2000 + 10, s"ring buffer bound, got $total") // + possible ts ties
  }

  test("command parser matches reference grammar") {
    val p = CommandParser.parse("signup rules add x if username regex ^bot then close+alt nodelay")
    assert(p.ok && p.kind == "add" && p.actions.contains("close+alt") && p.noDelay.contains(true))
    assert(p.expiryDays.contains(182))
    val lua = CommandParser.parse("signup rules add lr if lua `regex(user:ua(), \"x\")` then close")
    assert(lua.ok && lua.field.contains("lua") && lua.value.exists(_.contains("regex(")))
    assert(!CommandParser.parse("signup rules add b if print equals x then close").ok)
    assert(CommandParser.parseExpiryDuration("3w") == Right(21))
    assert(CommandParser.parseExpiryDuration("0d").isLeft)
    assert(CommandParser.parseExpiryDuration("xd").isLeft)
    // the reference parses u32: a negative renew is a format error, not a
    // rule silently expired into the past
    assert(CommandParser.parseExpiryDuration("-5d").isLeft)
    // the week multiply must not wrap Int back into "valid but negative",
    // and accepted day counts must stay micros-safe for the downstream
    // nowUs + days·86400e6 conversion
    assert(CommandParser.parseExpiryDuration("310000000w").isLeft)
    assert(CommandParser.parseExpiryDuration("2000000000d").isLeft)
    assert(CommandParser.parseExpiryDuration("100000000d") == Right(100000000))
  }

  test("status watermark flags types silent for >90s before stream end") {
    val rows = enrich.EnrichQueries.statusWatermark(spark, sf).collect()
    assert(rows.length == 5)
    val maxAll = rows.map(_.getAs[Long]("latest_us")).max
    rows.foreach { r =>
      val expected = maxAll - r.getAs[Long]("latest_us") > 90000000L
      assert(r.getAs[Boolean]("silent") == expected)
    }
  }

  test("ru_geo_velocity: zero join nodes; every alert is a sub-hour country change") {
    val q = enrich.EnrichQueries.geoVelocity(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"geo enrichment must be the RangeLookup projection, not a join:\n${plan.take(600)}")
    val exchanges = plan.sliding("Exchange".length).count(_ == "Exchange")
    assert(exchanges == 1, s"the lag window is the only shuffle, got $exchanges")
    val rows = q.collect()
    assert(rows.nonEmpty, "fixture signups never hop countries — detector unexercised")
    rows.foreach { r =>
      assert(r.getAs[String]("country") != r.getAs[String]("prev_country"))
      assert(r.getAs[Long]("gap_us") <= 3600000000L && r.getAs[Long]("gap_us") >= 0L)
    }
  }
}
