package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoIP enrichment (SURVEY §2a #13).
  *
  * The reference looks every signup IP up in MaxMind's city db
  * (eventhandler.rs:74-88, event.rs:64-87). A GeoIP db IS an
  * (ip_start, ip_end) → location table, so the 100 TB-scale realization is a
  * broadcast non-equi range join: the events side streams, the range dim
  * (a few MB even for full MaxMind) broadcasts, and Catalyst plans a
  * BroadcastNestedLoopJoin with the BETWEEN predicate evaluated in codegen.
  *
  * The dim here is a deterministic 16-range table standing in for MaxMind
  * (same join shape; swap the VALUES for the real db in production).
  */
object GeoIp {

  final case class IpRange(lo: Long, hi: Long, country: String, city: String,
      subdivisions: Seq[String])

  /** 16 ranges tiling first-octet space [0, 224): 14 octets each. The
    * subdivision list mirrors GeoipInfo.subdivisions (event.rs:68) —
    * 0/1/2 entries depending on the range, since MaxMind rows carry a
    * variable-length region path. */
  val ranges: Seq[IpRange] = (0 until 16).map { i =>
    IpRange(i.toLong * 14 * (1L << 24), (i + 1).toLong * 14 * (1L << 24) - 1,
      f"C$i%02d", f"City$i%02d",
      (0 until i % 3).map(j => f"S$i%02d${('A' + j).toChar}"))
  }

  def rangesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ranges.map(r => (r.lo, r.hi, r.country, r.city, r.subdivisions))
      .toDF("lo", "hi", "country", "city", "subdivisions")
  }

  val rangesValuesSql: String = {
    val rows = ranges.map { r =>
      val subs = r.subdivisions.map(s => s"'$s'").mkString("[", ", ", "]")
      s"(${r.lo}, ${r.hi}, '${r.country}', '${r.city}', $subs::VARCHAR[])"
    }.mkString(",\n    ")
    s"""geo(lo, hi, country, city, subdivisions) AS (
       |  VALUES
       |    $rows
       |)""".stripMargin
  }

  /** Strict dotted-quad shape: four octets, each 0-255 — anything else
    * (IPv6, out-of-range octets, garbage) must map to null, NOT alias into
    * another range's integer space ("0.300.0.1" would otherwise enrich to
    * a wrong location instead of failing closed). */
  private val dottedQuadRe = {
    val o = "(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    // \z, not $: Java's $ matches before a trailing newline, so
    // "1.2.3.4\n" would pass here yet fail the oracle's RE2 full-match
    s"^$o\\.$o\\.$o\\.$o\\z"
  }

  /** Dotted-quad string → 32-bit integer value; malformed input → null. */
  def ipToInt(ipCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val o = split(ipCol, "\\.")
    when(ipCol.rlike(dottedQuadRe),
      o.getItem(0).cast("long") * 16777216L + o.getItem(1).cast("long") * 65536L +
        o.getItem(2).cast("long") * 256L + o.getItem(3).cast("long"))
  }

  /** Driver-side dotted-quad → long (for building literals/oracle SQL). */
  def ipToLong(ip: String): Long =
    ip.split("\\.").map(_.toLong).foldLeft(0L)((a, o) => a * 256 + o)

  val ipToIntSql: String =
    """(CASE WHEN regexp_full_match(ip,
      |    '(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)')
      |  THEN CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 +
      |   CAST(string_split(ip, '.')[2] AS BIGINT) * 65536 +
      |   CAST(string_split(ip, '.')[3] AS BIGINT) * 256 +
      |   CAST(string_split(ip, '.')[4] AS BIGINT) END)""".stripMargin

  /** Left range join: rows outside every range keep null location (the
    * reference logs and continues on lookup failure). */
  def enrich(users: DataFrame, geo: DataFrame): DataFrame = {
    val withInt = users.withColumn("ip_int", ipToInt(col("ip")))
    withInt.join(broadcast(geo),
      col("ip_int") >= col("lo") && col("ip_int") <= col("hi"), "left")
  }

  /** Same result as [[enrich]] with no join node at all: binary-search the
    * sorted range bounds per row (graft.plans.RangeLookup, O(log R) vs the
    * BroadcastNestedLoopJoin's O(R) per row) and fetch the location
    * attributes by index from literal arrays. Valid whenever the dim is
    * broadcast-small and intervals are disjoint — exactly the GeoIP case;
    * at 1000 executors this removes the NLJ probe loop from every scanned
    * event row. Pass a dim loaded from a real MaxMind CSV export via
    * [[MaxMindCsv.loadRanges]]; defaults to the built-in stand-in. */
  def enrichFast(users: DataFrame, dim: Seq[IpRange] = ranges): DataFrame = {
    val sorted = dim.sortBy(_.lo).toArray
    val countries = typedLit(sorted.map(_.country).toSeq)
    val cities = typedLit(sorted.map(_.city).toSeq)
    val subs = typedLit(sorted.map(_.subdivisions.toSeq).toSeq)
    users
      // ip_int FIRST and the probe reads the column: after CollapseProject
      // the trees are identical anyway, so codegen's common-subexpression
      // elimination computes the parse once — referencing the column keeps
      // that sharing structural instead of relying on expression equality
      .withColumn("ip_int", ipToInt(col("ip")))
      .withColumn("gidx", graft.plans.RangeLookup(col("ip_int"),
        sorted.map(_.lo), sorted.map(_.hi)))
      .withColumn("country", element_at(countries, col("gidx")))
      .withColumn("city", element_at(cities, col("gidx")))
      .withColumn("subdivisions", element_at(subs, col("gidx")))
      .drop("gidx")
  }
}
