package graft.events

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-pipeline operators (SURVEY §2a #1-3).
  *
  * Mirrors the reference's ingest loop (eventstream.rs:40-62: split NDJSON
  * chunks, JSON-decode each line, drop malformed, count throughput) as
  * declarative transforms: `from_json` with an explicit schema (malformed →
  * null, the PERMISSIVE analog of the reference's `deserialize error` skip),
  * time-bucketed counting, and tagged-event filtering with pushdown.
  */
object EventOps {

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** JSON payload parsing: schema'd extraction from the raw `props` string;
    * unparseable payloads surface as null `k` (reference drops them). */
  def parseJson(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    ev.select(
        col("event_id"),
        from_json(col("props"), propsSchema).as("p"))
      .select(
        col("event_id"),
        col("p.k").as("k"),
        col("p.k").isNotNull.as("valid"))
  }

  val parseJsonSql: String =
    """SELECT event_id,
      |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k,
      |  regexp_extract(props, '"k": ([0-9]+)', 1) <> '' AS valid
      |FROM events""".stripMargin

  /** Ingest throughput: events per hour per type (the reference counts every
    * 400 lines; the scalable form is a time-bucketed aggregation). */
  def throughput(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    ev.groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
  }

  val throughputSql: String =
    """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_epoch,
      |  event_type,
      |  count(*) AS n,
      |  round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Tagged-event filter + projection (Event::Signup variant): predicate and
    * column pruning both reach the parquet scan. */
  def signups(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir).events
    ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
  }

  val signupsSql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      |FROM events
      |WHERE event_type = 'signup'""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_parse_json" -> (parseJson _),
    "ev_throughput" -> (throughput _),
    "ev_signups" -> (signups _))

  def oracleSql: Map[String, String] = Map(
    "ev_parse_json" -> parseJsonSql,
    "ev_throughput" -> throughputSql,
    "ev_signups" -> signupsSql)
}
