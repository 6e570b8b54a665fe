package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables.
  *
  * `events.ts` is written as parquet INT64 TIMESTAMP(NANOS) which Spark's
  * TimestampType (µs) cannot represent; we read it as raw nanos
  * (`spark.sql.legacy.parquet.nanosAsLong`) and expose both the raw long and
  * a µs-truncated TimestampType column — the same truncation DuckDB applies
  * when casting timestamp_ns to TIMESTAMP, so oracle comparisons agree.
  */
final class Tables(spark: SparkSession, sfDir: String) {
  private def load(name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region: DataFrame = load("region")
  def nation: DataFrame = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame = load("part")
  def orders: DataFrame = load("orders")
  def lineitem: DataFrame = load("lineitem")
  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** events with `ts` converted from raw nanos to µs TimestampType (UTC). */
  def events: DataFrame = {
    val raw = load("events")
    raw
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables = new Tables(spark, sfDir)
}
