package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MaxMind GeoLite2/GeoIP2 CSV-export loader (SURVEY §2a #13; reference
  * eventhandler.rs:46-47 opens the binary `.mmdb` — the CSV export is the
  * same data in the documented public format).
  *
  * Input: the two standard files of a City CSV export —
  *  - `*-Blocks-IPv4.csv`: `network` (CIDR), `geoname_id`, …
  *  - `*-Locations-en.csv`: `geoname_id`, `country_name`,
  *    `subdivision_1_name`, `subdivision_2_name`, `city_name`, …
  *
  * Output: the engine's geo dim — `(lo, hi, country, city, subdivisions)`
  * rows feeding [[GeoIp.enrich]] (range join) or, collected via
  * [[loadRanges]], the zero-join [[GeoIp.enrichFast]] path. CIDR → [lo, hi]
  * is pure column math (base address + 2^(32-prefix) − 1), so the load is
  * one distributed CSV scan + a broadcast join on geoname_id — no UDFs.
  */
object MaxMindCsv {

  /** Distributed load: blocks ⨝ locations → geo-dim DataFrame. */
  def loadDim(spark: SparkSession, blocksCsv: String, locationsCsv: String): DataFrame = {
    val blocks = spark.read.option("header", "true").csv(blocksCsv)
      .select(col("network"), col("geoname_id"))
      .filter(col("network").isNotNull && col("geoname_id").isNotNull)
    val net = split(col("network"), "/")
    // CIDR base addresses are prefix-aligned, so base is already `lo`;
    // 2^(32-prefix) is exact in a double up to 2^32 — cast is lossless
    val lo = GeoIp.ipToInt(element_at(net, 1))
    val span = pow(lit(2.0), lit(32) - element_at(net, 2).cast("int")).cast("long")
    val ranged = blocks
      .select(col("geoname_id"), lo.as("lo"), (lo + span - 1).as("hi"))
    val locs = spark.read.option("header", "true").csv(locationsCsv)
      .select(col("geoname_id"),
        col("country_name").as("country"),
        coalesce(col("city_name"), lit("")).as("city"),
        filter(array(col("subdivision_1_name"), col("subdivision_2_name")),
          x => x.isNotNull && x =!= "").as("subdivisions"))
    ranged.join(broadcast(locs), "geoname_id")
      .select(col("lo"), col("hi"), col("country"), col("city"), col("subdivisions"))
  }

  /** Collect the dim for the [[GeoIp.enrichFast]] binary-search path. A
    * GeoIP dim is broadcast-small by contract (full GeoLite2 City is a few
    * hundred MB of CSV → tens of MB of ranges), and the collect happens
    * once per job, not per row.
    *
    * Nested networks (CSV exports can carry them) flatten with MaxMind's
    * longest-prefix-wins semantics: the more-specific block owns its
    * addresses and the enclosing block keeps the remainder segments on
    * either side — so the disjointness invariant RangeLookup requires
    * holds WITHOUT losing coverage. CIDR blocks are disjoint or properly
    * nested, never partially overlapping, so a single stack sweep over
    * (lo asc, hi desc) order suffices. */
  def loadRanges(spark: SparkSession, blocksCsv: String, locationsCsv: String): Seq[GeoIp.IpRange] = {
    val rows = loadDim(spark, blocksCsv, locationsCsv)
      .orderBy(col("lo").asc, col("hi").desc)
      .collect()
    val out = Seq.newBuilder[GeoIp.IpRange]
    val stack = scala.collection.mutable.Stack.empty[GeoIp.IpRange]
    var cursor = 0L
    def emitTo(hi: Long, r: GeoIp.IpRange): Unit =
      if (cursor <= hi) {
        out += GeoIp.IpRange(cursor, hi, r.country, r.city, r.subdivisions)
        cursor = hi + 1
      }
    rows.foreach { row =>
      val r = GeoIp.IpRange(row.getLong(0), row.getLong(1), row.getString(2),
        row.getString(3), row.getSeq[String](4))
      // enclosing ranges that end before this one starts are done
      while (stack.nonEmpty && stack.top.hi < r.lo) { val t = stack.pop(); emitTo(t.hi, t) }
      // the (innermost) enclosing network keeps the segment up to r's start
      if (stack.nonEmpty && cursor < r.lo) emitTo(r.lo - 1, stack.top)
      if (cursor < r.lo) cursor = r.lo // gap with no enclosing network
      // exact-duplicate rows keep the first occurrence
      if (stack.isEmpty || stack.top.lo != r.lo || stack.top.hi != r.hi) stack.push(r)
    }
    while (stack.nonEmpty) { val t = stack.pop(); emitTo(t.hi, t) }
    out.result()
  }
}
