package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-format dim loaders: MaxMind CSV export → geo dim; uap-core
  * regexes.yaml → UA parse cascade. */
class DimLoaderSpec extends AnyFunSuite {
  import SparkTest._

  private def write(dir: java.nio.file.Path, name: String, content: String): String = {
    val p = dir.resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("MaxMind CSV blocks+locations load into the geo dim with correct CIDR math") {
    val dir = Files.createTempDirectory("mmcsv")
    val blocks = write(dir, "blocks.csv",
      """network,geoname_id,registered_country_geoname_id,represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider,postal_code,latitude,longitude,accuracy_radius
        |1.0.0.0/24,2077456,2077456,,0,0,,-33.4940,143.2104,1000
        |1.0.4.0/22,2158177,2077456,,0,0,3000,-37.8349,144.9631,20
        |8.8.8.0/24,5375480,6252001,,0,0,94035,37.3860,-122.0838,1000
        |""".stripMargin)
    val locs = write(dir, "locations.csv",
      """geoname_id,locale_code,continent_code,continent_name,country_iso_code,country_name,subdivision_1_iso_code,subdivision_1_name,subdivision_2_iso_code,subdivision_2_name,city_name,metro_code,time_zone,is_in_european_union
        |2077456,en,OC,Oceania,AU,Australia,,,,,,,Australia/Sydney,0
        |2158177,en,OC,Oceania,AU,Australia,VIC,Victoria,,,Melbourne,,Australia/Melbourne,0
        |5375480,en,NA,"North America",US,United States,CA,California,,,"Mountain View",807,America/Los_Angeles,0
        |""".stripMargin)

    val dim = enrich.MaxMindCsv.loadDim(spark, blocks, locs).orderBy(col("lo")).collect()
    assert(dim.length == 3)
    // 1.0.0.0/24 → [16777216, 16777471]
    assert(dim(0).getLong(0) == 16777216L && dim(0).getLong(1) == 16777471L)
    assert(dim(0).getString(2) == "Australia" && dim(0).getString(3) == "")
    // 1.0.4.0/22 spans 1024 addresses
    assert(dim(1).getLong(1) - dim(1).getLong(0) == 1023L)
    assert(dim(1).getString(3) == "Melbourne")
    assert(dim(1).getSeq[String](4) == Seq("Victoria"))
    // quoted city with comma handled by the CSV reader
    assert(dim(2).getString(3) == "Mountain View")

    // ranges feed both enrichment paths and agree
    val ranges = enrich.MaxMindCsv.loadRanges(spark, blocks, locs)
    assert(ranges.map(_.city) == Seq("", "Melbourne", "Mountain View"))
    import spark.implicits._
    val users = Seq((1L, "1.0.4.77"), (2L, "8.8.8.8"), (3L, "9.9.9.9"))
      .toDF("event_id", "ip")
    val fast = enrich.GeoIp.enrichFast(users, ranges)
      .select("event_id", "city").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(fast(1L).contains("Melbourne"))
    assert(fast(2L).contains("Mountain View"))
    assert(fast(3L).isEmpty)
    val viaJoin = enrich.GeoIp.enrich(users, enrich.MaxMindCsv.loadDim(spark, blocks, locs))
      .select("event_id", "city").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaJoin == fast)
  }

  test("nested networks flatten longest-prefix-wins with remainder coverage") {
    val dir = Files.createTempDirectory("mmcsv_nested")
    // 1.0.0.0/16 encloses 1.0.4.0/24 — the /24 (Melbourne) must own its
    // addresses while the /16 (Sydney) keeps BOTH remainder sides
    val blocks = write(dir, "blocks.csv",
      """network,geoname_id,registered_country_geoname_id,represented_country_geoname_id,is_anonymous_proxy,is_satellite_provider,postal_code,latitude,longitude,accuracy_radius
        |1.0.0.0/16,2147714,2077456,,0,0,,-33.86,151.20,1000
        |1.0.4.0/24,2158177,2077456,,0,0,3000,-37.83,144.96,20
        |""".stripMargin)
    val locs = write(dir, "locations.csv",
      """geoname_id,locale_code,continent_code,continent_name,country_iso_code,country_name,subdivision_1_iso_code,subdivision_1_name,subdivision_2_iso_code,subdivision_2_name,city_name,metro_code,time_zone,is_in_european_union
        |2147714,en,OC,Oceania,AU,Australia,NSW,"New South Wales",,,Sydney,,Australia/Sydney,0
        |2158177,en,OC,Oceania,AU,Australia,VIC,Victoria,,,Melbourne,,Australia/Melbourne,0
        |""".stripMargin)
    val ranges = enrich.MaxMindCsv.loadRanges(spark, blocks, locs)
    // three disjoint segments: /16-before, the /24, /16-after
    assert(ranges.map(_.city) == Seq("Sydney", "Melbourne", "Sydney"))
    assert(ranges.sliding(2).forall { case Seq(a, b) => a.hi < b.lo })
    import spark.implicits._
    val users = Seq((1L, "1.0.0.7"), (2L, "1.0.4.200"), (3L, "1.0.250.1"))
      .toDF("event_id", "ip")
    val got = enrich.GeoIp.enrichFast(users, ranges)
      .select("event_id", "city").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "Sydney", 2L -> "Melbourne", 3L -> "Sydney"))
  }

  test("a quoted regex containing '#' survives parsing; cascades stay flat") {
    val yaml =
      """user_agent_parsers:
        |# a full-line comment
        |  - regex: '(Foo)#(\d+)'
        |    family_replacement: 'FooHash'
        |""".stripMargin
    val db = enrich.UapCore.parse(yaml)
    assert(db.clients == Seq(enrich.UapCore.Pattern("(Foo)#(\\d+)", Some("FooHash"))))
    // a realistic-scale pattern list must not nest one CaseWhen per entry
    // (Catalyst recursion / 64KB codegen limits at uap-core's ~1000 rows)
    val big = (0 until 1000).map(i => enrich.UapCore.Pattern(s"(AgentNo$i)/", None))
    import spark.implicits._
    val df = Seq("AgentNo7/1.0", "nothing").toDF("ua")
    val out = df.select(enrich.UapCore.family(col("ua"), big).as("fam"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("AgentNo7", "Other"))
  }

  test("uap-core regexes.yaml compiles to the regexp cascade") {
    val yaml =
      """user_agent_parsers:
        |  - regex: '(ESPN)[%20| ]+Radio/(\d+)'
        |    family_replacement: 'ESPN'
        |  - regex: 'Firefox/(\d+)\.(\d+)'
        |    family_replacement: 'Firefox'
        |  - regex: '(Chrome)/(\d+)'
        |  - regex: 'PyAmf/(\d+)'
        |    family_replacement: 'PyAmf $1'
        |
        |os_parsers:
        |  - regex: 'Windows NT 10\.0'
        |    os_replacement: 'Windows'
        |  - regex: '(CentOS)'
        |
        |device_parsers:
        |  - regex: 'iPhone'
        |    device_replacement: 'iPhone'
        |""".stripMargin
    val db = enrich.UapCore.parse(yaml)
    assert(db.clients.length == 4)
    assert(db.clients(0).replacement.contains("ESPN"))
    assert(db.clients(2).replacement.isEmpty)
    assert(db.os.length == 2 && db.devices.length == 1)

    import spark.implicits._
    val uas = Seq(
      "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36",
      "Mozilla/5.0 (X11; CentOS) Firefox/115.0",
      "PyAmf/3.2 (iPhone)",
      "weird-client/0.1").toDF("ua")
    val (dev, os, client) = enrich.UapCore.parseColumns(col("ua"), db)
    val rows = uas.select(client.as("c"), os.as("o"), dev.as("d")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) == (("Chrome", "Windows", "Other")))
    assert(rows(1) == (("Firefox", "CentOS", "Other")))
    assert(rows(2) == (("PyAmf 3", "Other", "iPhone")))
    assert(rows(3) == (("Other", "Other", "Other")))
  }

  test("uap-core: regex_flag 'i', multi-group templates, and null-UA contract") {
    val yaml =
      """device_parsers:
        |  - regex: 'hbbtv'
        |    regex_flag: 'i'
        |    device_replacement: 'SmartTV'
        |  - regex: '; ?(LG-?([\dA-Za-z]+))'
        |    device_replacement: 'LG $2'
        |  - regex: '(roku) ?(\d)'
        |    regex_flag: 'i'
        |""".stripMargin
    val db = enrich.UapCore.parse(yaml)
    assert(db.devices.head.caseInsensitive, "regex_flag: 'i' must be honored")
    import spark.implicits._
    val uas = Seq(
      Some("Mozilla/5.0 (HbbTV/1.1.1)"),  // matches only case-insensitively
      Some("Mozilla/5.0 (Linux; LG-K420) Browser"), // $2 = inner group
      Some("nothing-known/1.0"),
      None,
      // regex_flag 'i' + NO replacement: the guard matches case-
      // insensitively and group-1 extraction must use the SAME flagged
      // regex — with a case-sensitive extract this returned '' (regression)
      Some("Roku 4 (DVP-7.70)")).toDF("ua")
    val fams = uas.select(enrich.UapCore.family(col("ua"), db.devices).as("f"))
      .collect().map(r => Option(r.getString(0)))
    assert(fams(0).contains("SmartTV"))
    assert(fams(1).contains("LG K420"), s"got ${fams(1)} — $$2 must substitute group 2")
    assert(fams(2).contains("Other"))
    assert(fams(3).isEmpty, "null UA parses to null, never the default")
    assert(fams(4).contains("Roku"),
      s"got ${fams(4)} — flagged no-replacement extract must stay case-insensitive")
  }

  test("uap-core fixture runner: test_device.yaml-format cases replay through the cascade") {
    // the published uap-core conformance-fixture format: a `test_cases`
    // section of (user_agent_string, expected family) items. The db below
    // uses real uap-core pattern shapes (template substitution, bare
    // group-1, regex_flag, first-match-wins ordering); pointing the same
    // runner at the project's full regexes.yaml + tests/test_device.yaml
    // needs no code change.
    val db = enrich.UapCore.parse(
      """device_parsers:
        |  - regex: '\((iPad|iPhone|iPod)( Simulator)?;'
        |    device_replacement: '$1'
        |  - regex: '; ?(LG-?[\dA-Za-z]+)[ )]'
        |    device_replacement: 'LG $1'
        |  - regex: 'hbbtv'
        |    regex_flag: 'i'
        |    device_replacement: 'SmartTV'
        |  - regex: '(Samsung)[- ]([A-Za-z0-9]+)'
        |""".stripMargin)
    val fixtures = enrich.UapCore.parseFixtures(
      """test_cases:
        |  - user_agent_string: 'Mozilla/5.0 (iPhone; CPU iPhone OS 10_3 like Mac OS X) Safari'
        |    family: 'iPhone'
        |  - user_agent_string: 'Mozilla/5.0 (iPad; CPU OS 9_3 like Mac OS X) Mobile'
        |    family: 'iPad'
        |  - user_agent_string: 'Mozilla/5.0 (Linux; U; Android 4.2.2; LG-D802 Build) Mobile'
        |    family: 'LG LG-D802'
        |  - user_agent_string: 'Opera/9.80 (Linux mips; HbbTV/1.1.1) SmartTvA/3.0.0'
        |    family: 'SmartTV'
        |  - user_agent_string: 'Mozilla/5.0 (SMART-TV; Samsung GT-I9505 Build) Mobile'
        |    family: 'Samsung'
        |  - user_agent_string: 'curl/7.88.1'
        |    family: 'Other'
        |""".stripMargin)
    assert(fixtures.length == 6)
    assert(fixtures.forall(c => c.contains("user_agent_string") && c.contains("family")))
    import spark.implicits._
    val df = fixtures.map(_("user_agent_string")).toDF("ua")
    val got = df.select(enrich.UapCore.family(col("ua"), db.devices).as("f"))
      .collect().map(_.getString(0)).toSeq
    val expected = fixtures.map(_("family"))
    assert(got == expected, s"cascade diverged from fixtures: $got vs $expected")
  }
}
