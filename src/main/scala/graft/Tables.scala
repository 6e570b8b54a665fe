package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables.
  *
  * `events.ts` is driver-owned and its physical type has varied across data
  * regenerations: parquet INT64 TIMESTAMP(NANOS) (unrepresentable in Spark's
  * µs TimestampType — read as raw nanos via
  * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (surfacing as TIMESTAMP_NTZ). The loader branches
  * on the LOADED dtype rather than hard-coding either contract, and exposes
  * the same normalized pair everywhere downstream:
  *
  *   - `ts`    µs-precision TimestampType, UTC session zone — the same value
  *             DuckDB produces for `CAST(ts AS TIMESTAMP)` on either flavor
  *   - `ts_ns` epoch nanos as Long (µs flavor: exact µs×1000)
  *
  * Mirrors the reference's ingest posture (eventstream.rs:14-73): the feed
  * owns the wire format; the consumer adapts.
  */
final class Tables(spark: SparkSession, sfDir: String) {
  private def load(name: String): DataFrame = Tables.cachedLoad(spark, sfDir, name)

  def region: DataFrame = load("region")
  def nation: DataFrame = load("nation")
  def customer: DataFrame = load("customer")
  def supplier: DataFrame = load("supplier")
  def part: DataFrame = load("part")
  def orders: DataFrame = load("orders")
  def lineitem: DataFrame = load("lineitem")
  def documents: DataFrame = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** events with `ts` normalized to µs TimestampType (UTC) + raw `ts_ns`. */
  def events: DataFrame = Tables.normalizeEventTs(load("events"))

  /** events at `ts < cutoffNs`, the predicate applied to the RAW loaded
    * column so it reaches `PushedFilters` in either flavor (a filter on the
    * derived `ts_ns` would not fold through the µs branch's cast) — the
    * incremental-refresh contract: O(delta) scan at 100 TB. */
  def eventsBefore(cutoffNs: Long): DataFrame = splitEvents(cutoffNs, before = true)

  /** events at `ts >= cutoffNs`; see [[eventsBefore]]. */
  def eventsFrom(cutoffNs: Long): DataFrame = splitEvents(cutoffNs, before = false)

  private def splitEvents(cutoffNs: Long, before: Boolean): DataFrame = {
    val raw = load("events")
    val cut = raw.schema("ts").dataType match {
      case LongType => lit(cutoffNs)
      case dt => timestamp_micros(lit(cutoffNs / 1000L)).cast(dt)
    }
    Tables.normalizeEventTs(
      if (before) raw.filter(col("ts") < cut) else raw.filter(col("ts") >= cut))
  }
}

object Tables {
  def apply(spark: SparkSession, sfDir: String): Tables = new Tables(spark, sfDir)

  /** r9 OPT (guide §1/§6): every `spark.read.parquet(path)` lists the
    * directory and reads a footer to infer the schema — pure driver-side
    * overhead repeated by EVERY query build (hundreds of times across a
    * bench sweep, several times per query). The unresolved READ PLAN is
    * immutable, so it is built once per (session, path) and reused; no DATA
    * is cached — every action still scans the parquet (re-verified: bench
    * passes re-execute the full scan).
    *
    * r10 fix (r9 ADVICE): the r9 form keyed a WeakHashMap by the session,
    * but the cached DataFrames strongly reference their session (via
    * QueryExecution) and WeakHashMap holds values strongly — entries for
    * stopped sessions were never collected. Now an access-order LRU keyed
    * by the session, bounded at [[maxCachedSessions]] entries: the sessions
    * ARE held strongly, but old ones are dropped deterministically on the
    * (maxCachedSessions+1)-th session instead of "eventually, maybe". */
  private val maxCachedSessions = 4
  private[graft] val sessionScoped =
    new java.util.LinkedHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, AnyRef]](
        16, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            scala.collection.concurrent.TrieMap[String, AnyRef]]): Boolean =
        size() > maxCachedSessions
    }

  /** Per-(session, key) driver-side memo for immutable plan/metadata
    * objects. NEVER caches data — values must be cheap driver objects
    * (read plans, partition counts). */
  private[graft] def sessionMemo[V <: AnyRef](spark: SparkSession, key: String)(
      build: => V): V = {
    val perSession = sessionScoped.synchronized {
      var m = sessionScoped.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, AnyRef]
        sessionScoped.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate(key, build).asInstanceOf[V]
  }

  private[graft] def cachedLoad(spark: SparkSession, sfDir: String,
      name: String): DataFrame =
    sessionMemo(spark, s"read:$sfDir/$name.parquet") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Schema-adaptive `ts` normalization — see class doc. Both branches yield
    * identical (`ts`, `ts_ns`) for the same instant, which the both-flavor
    * loader spec asserts. */
  def normalizeEventTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType => // INT64 TIMESTAMP(NANOS) read as raw nanos
      raw
        .withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    case TimestampType | TimestampNTZType =>
      raw
        .withColumn("ts_ns", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
        .withColumn("ts", col("ts").cast(TimestampType))
    case other: DataType =>
      throw new IllegalStateException(
        s"events.ts loaded as unsupported type $other; expected LongType (nanos) or TIMESTAMP[_NTZ]")
  }
}
