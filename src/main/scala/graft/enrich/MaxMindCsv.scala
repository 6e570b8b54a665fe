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
    * once per job, not per row. Ranges come back sorted by `lo`;
    * overlapping rows (CSV exports can carry nested networks) keep the
    * first, so the disjointness invariant RangeLookup requires holds. */
  def loadRanges(spark: SparkSession, blocksCsv: String, locationsCsv: String): Seq[GeoIp.IpRange] = {
    val rows = loadDim(spark, blocksCsv, locationsCsv)
      .orderBy(col("lo"), col("hi"))
      .collect()
    val out = Seq.newBuilder[GeoIp.IpRange]
    var lastHi = -1L
    rows.foreach { r =>
      val lo = r.getLong(0)
      if (lo > lastHi) {
        out += GeoIp.IpRange(lo, r.getLong(1), r.getString(2), r.getString(3),
          r.getSeq[String](4))
        lastHi = r.getLong(1)
      }
    }
    out.result()
  }
}
