package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Restart-safety: checkpointed streaming jobs resume without loss or
  * duplication, and the action dispatcher is effectively-once across
  * replays — the properties that let the reference program run unattended. */
class RecoverySpec extends AnyFunSuite {
  import SparkTest._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** events split into two parquet files so the file source has two
    * distinct micro-batches to discover. */
  private def splitEvents(): String = {
    val dir = tmp("ev_split")
    val ev = Tables(spark, sf).events
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(dir)
    dir
  }

  test("grouped counts survive a stop/restart on the same checkpoint") {
    val srcDir = tmp("ev_incr")
    val ckpt = tmp("ckpt")
    val ev = Tables(spark, sf).events
    val schema = ev.schema
    def stream() = spark.readStream.schema(schema).parquet(srcDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))

    // run 1 sees only the first half, then stops
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = stream().writeStream.format("memory").queryName("rec1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try q1.processAllAvailable() finally q1.stop()
    val partial = spark.table("rec1").collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // second half lands while the job is DOWN; the restart must recover its
    // aggregation state from the checkpoint and produce complete totals
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = stream().writeStream.format("memory").queryName("rec2")
      .outputMode("complete").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val resumed = spark.table("rec2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val expected = ev.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(resumed == expected, s"resumed run must complete the totals: $resumed vs $expected")
    assert(partial.values.sum < expected.values.sum, "first run saw only the first file")
  }

  test("minhash dedup bucket ownership survives stop/restart and matches batch replay") {
    val srcDir = tmp("docs_incr")
    val ckpt = tmp("ckpt_mh")
    val docs = Tables(spark, sf).documents
    val schema = docs.schema
    def owners() = {
      val arrs = spark.readStream.schema(schema).parquet(srcDir)
        .select(col("doc_id"),
          graft.plans.ShingleHashes(col("text"), 3, distinct = true).as("hs_arr"))
      dedup.Dedup.bandRows(arrs)
        .groupBy(col("band"), col("key")).agg(min(col("doc_id")).as("keeper"))
    }
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = owners().writeStream.format("memory").queryName("mh1")
      .outputMode("complete").option("checkpointLocation", ckpt).start()
    try q1.processAllAvailable() finally q1.stop()
    // second half lands while the job is down; ownership state must recover
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = owners().writeStream.format("memory").queryName("mh2")
      .outputMode("complete").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val resumed = spark.table("mh2").select("keeper").distinct()
      .collect().map(_.getLong(0)).sorted
    // min-ownership is order-independent, so recovery == one-shot batch
    val batch = dedup.Dedup.bandRows(
        docs.select(col("doc_id"),
          graft.plans.ShingleHashes(col("text"), 3, distinct = true).as("hs_arr")))
      .groupBy(col("band"), col("key")).agg(min(col("doc_id")).as("keeper"))
      .select("keeper").distinct().collect().map(_.getLong(0)).sorted
    assert(resumed.sameElements(batch))
  }

  test("action dispatch is effectively-once across a replayed batch") {
    import spark.implicits._
    val logDir = tmp("dispatch_log") + "/log"
    val batch = Seq((1L, "r_a", "close"), (2L, "r_b", "notify"), (1L, "r_a", "close"))
      .toDF("event_id", "rule_name", "actions")
    var acted = Seq.empty[(Long, String)]
    def act(df: org.apache.spark.sql.DataFrame): Unit =
      acted ++= df.select("event_id", "rule_name").as[(Long, String)].collect()

    // first delivery: in-batch duplicate collapses, both rules fire once
    val fresh1 = graft.streaming.ActionSink.undispatched(spark, batch, logDir)
    act(fresh1); fresh1.write.mode("append").parquet(logDir)
    assert(acted.sorted == Seq((1L, "r_a"), (2L, "r_b")))

    // replay of the same batch (the at-least-once case): nothing re-fires
    val fresh2 = graft.streaming.ActionSink.undispatched(spark, batch, logDir)
    act(fresh2)
    assert(acted.size == 2, "replayed batch must not re-dispatch")

    // a genuinely new match still goes out
    val batch2 = Seq((3L, "r_a", "close")).toDF("event_id", "rule_name", "actions")
    val fresh3 = graft.streaming.ActionSink.undispatched(spark, batch2, logDir)
    act(fresh3); fresh3.write.mode("append").parquet(logDir)
    assert(acted.sorted == Seq((1L, "r_a"), (2L, "r_b"), (3L, "r_a")))
  }

  test("ActionSink.dispatch end-to-end over a streaming source") {
    val srcDir = splitEvents()
    val logDir = tmp("dispatch_e2e") + "/log"
    val ckpt = tmp("ckpt_e2e")
    val schema = Tables(spark, sf).events.schema
    val matched = spark.readStream.schema(schema).parquet(srcDir)
      .filter(col("event_type") === "signup")
      .select(col("event_id"), lit("r_stream").as("rule_name"))
    val q = graft.streaming.ActionSink.dispatch(spark, matched, logDir, ckpt)(_ => ())
    try q.processAllAvailable() finally q.stop()
    val logged = spark.read.parquet(logDir)
    val expected = Tables(spark, sf).events.filter(col("event_type") === "signup").count()
    assert(logged.count() == expected)
    assert(logged.select("event_id").distinct().count() == expected, "no duplicate dispatches")
  }
}
