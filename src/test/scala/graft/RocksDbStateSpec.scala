package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RocksDB state store provider as a configuration twin for the 39
  * streaming rows (round-8 verdict #1): every st_* row runs on the default
  * in-heap HDFSBackedStateStoreProvider, whose 100 TB posture is
  * executor-heap-bounded (st_series_sim's per-user count matrices,
  * st_bitmap's per-user state all live on-heap between micro-batches).
  * RocksDB moves that state off-heap onto local SSD with incremental
  * checkpointing — Spark's documented answer for large-state deployments —
  * and is a PURE config swap (`spark.sql.streaming.stateStore.providerClass`),
  * so one output-identity spec over representative stateful rows certifies
  * the whole st_* family: the rows never touch provider APIs, only the
  * state-store contract. */
class RocksDbStateSpec extends AnyFunSuite {
  import SparkTest._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[A](provider: Option[String])(f: => A): A = {
    val before = spark.conf.getOption(providerKey)
    provider.foreach(spark.conf.set(providerKey, _))
    try f
    finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def dump(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).toSeq.sorted

  test("st_sessionize and st_series_lsh outputs are identical under RocksDB") {
    // the directive's two representatives: a flat per-key session state and
    // the heaviest read-time-view state (the per-user day-count matrix the
    // series search drains) — if these agree, the provider swap is sound
    // for the family
    val base = withProvider(None) {
      (dump(streaming.StreamOps.sessionize(spark, sf)),
        dump(streaming.StreamOps.seriesLshLive(spark, sf)))
    }
    val rocks = withProvider(Some(rocksProvider)) {
      (dump(streaming.StreamOps.sessionize(spark, sf)),
        dump(streaming.StreamOps.seriesLshLive(spark, sf)))
    }
    assert(base._1.nonEmpty && base._2.nonEmpty)
    assert(rocks._1 == base._1, "st_sessionize must be provider-invariant")
    assert(rocks._2 == base._2, "st_series_lsh must be provider-invariant")
  }

  test("RocksDB provider actually engages (rocksdb custom metrics in state telemetry)") {
    // output identity alone could pass vacuously if the conf were ignored —
    // hold a query handle and check the state operator's custom metrics
    // carry rocksdb counters (the provider stamps its own metric family)
    withProvider(Some(rocksProvider)) {
      val schema = Tables(spark, sf).events.schema
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("rocksdb_probe")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val so = q.lastProgress.stateOperators
        assert(so.nonEmpty, "stateful agg must report a state operator")
        val metricKeys = so.head.customMetrics.keySet().toArray.mkString(",")
        assert(metricKeys.contains("rocksdb"),
          s"expected rocksdb custom metrics, got: $metricKeys")
        info(s"state rows=${so.head.numRowsTotal} " +
          s"memoryUsedBytes=${so.head.memoryUsedBytes} " +
          s"sstBytes=${so.head.customMetrics.get("rocksdbSstFileSize")}")
      } finally q.stop()
    }
  }
}
