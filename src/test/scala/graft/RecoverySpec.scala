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

  test("live rule update: a stream-static match picks up a rules-file rewrite mid-stream") {
    // the reference mutates its rule set at runtime (rules.rs add/remove
    // while the stream runs); the Spark analog is a stream-static join
    // whose static side re-executes per micro-batch — a RuleStore.save
    // between batches must take effect without restarting the query
    val srcDir = tmp("ev_rules_live")
    val rulesDir = tmp("rules_live")
    val ev = Tables(spark, sf).events

    def rule(name: String, pattern: String) = rules.RuleRow(
      name, "username_contains", pattern, 0, enabled = true, suspOnly = false,
      noDelay = true, expiryUs = None, actions = "notify_zulip")

    val spark0 = spark
    import spark0.implicits._
    def rulesDf(rs: rules.RuleRow*) = rs.toSeq
      .map(r => (r.name, r.kind, r.pattern, r.numArg, r.enabled, r.suspOnly,
        r.noDelay, r.expiryUs, r.actions))
      .toDF("name", "kind", "pattern", "num_arg", "enabled", "susp_only",
        "no_delay", "expiry_us", "actions")

    rules.RuleStore.save(rulesDf(rule("r_v1", "ER_1")), rulesDir)

    // a plain stream-static join pins the static side's FILE LISTING at
    // plan time (an overwritten rules file turns into FAILED_READ_FILE,
    // verified empirically) — the production pattern for a live-updated
    // dim is re-loading it INSIDE foreachBatch, where each micro-batch
    // builds a fresh plan (and a fresh file index) for the dim
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = events.Signups.derive(
        spark.readStream.schema(ev.schema).parquet(srcDir))
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.join(rules.RuleStore.load(batch.sparkSession, rulesDir)
            .filter(col("enabled") && col("kind") === "username_contains"),
          expr("instr(upper(username), upper(pattern)) > 0"))
          .select(col("event_id"), col("name"))
          .collect()
          .foreach(r => got.add(r.getLong(0) -> r.getString(1)))
        ()
      }.start()
    try {
      // batch 1 under rules v1
      ev.filter(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val after1 = got.toArray(Array.empty[(Long, String)])
      assert(after1.nonEmpty && after1.forall(_._2 == "r_v1"))

      // rules REWRITTEN while the query keeps running
      rules.RuleStore.save(rulesDf(rule("r_v2", "ER_2")), rulesDir)

      // batch 2 must match under v2 only
      ev.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val batch2 = got.toArray(Array.empty[(Long, String)]).filter(_._1 % 2 == 1)
      assert(batch2.nonEmpty, "batch 2 must produce matches")
      assert(batch2.forall(_._2 == "r_v2"),
        "post-rewrite micro-batches must match against the NEW rule set")
    } finally q.stop()
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

  test("dispatchDelayed holds actions until the event-time clock passes their deadline") {
    import spark.implicits._
    val srcDir = tmp("delay_src")
    val pendingDir = tmp("delay_pend") + "/pending"
    val logDir = tmp("delay_log") + "/log"

    def matchedStream() = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rule_name", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("action", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("no_delay", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType)))
      spark.readStream.schema(schema).parquet(srcDir)
        .withColumn("due_us", col("ts_us") +
          graft.streaming.ActionSink.actionDelayUs(col("event_id"), col("action"), col("no_delay")))
    }
    def run(ckpt: String): Unit = {
      val q = graft.streaming.ActionSink.dispatchDelayed(
        spark, matchedStream(), pendingDir, logDir, ckpt)(_ => ())
      try q.processAllAvailable() finally q.stop()
    }
    // file 1: a delayed close at t=0 (deadline in [31.5, 101.5) s) and an
    // undelayed notify at t=10 s — the clock reaches 10 s, so only the
    // notify may dispatch; the close MUST still be pending
    Seq((1L, "r_close", "close", false, 0L), (2L, "r_notify", "notify", false, 10000000L))
      .toDF("event_id", "rule_name", "action", "no_delay", "ts_us")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run(tmp("delay_ckpt1"))
    val after1 = spark.read.parquet(logDir).select("event_id").as[Long].collect().toSet
    assert(after1 == Set(2L), s"no dispatch before its deadline — got $after1")

    // file 2: a later event pushes the clock past every deadline
    Seq((3L, "r_notify", "notify", true, 200000000L))
      .toDF("event_id", "rule_name", "action", "no_delay", "ts_us")
      .coalesce(1).write.mode("append").parquet(srcDir)
    run(tmp("delay_ckpt2"))
    val after2 = spark.read.parquet(logDir).select("event_id").as[Long].collect().toSet
    assert(after2 == Set(1L, 2L, 3L), s"deadline passed -> dispatch, got $after2")

    // full replay on a FRESH checkpoint (at-least-once): nothing re-fires
    run(tmp("delay_ckpt3"))
    assert(spark.read.parquet(logDir).count() == 3, "effectively-once after restart")
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

  test("RuleStore: a crash between delete and rename recovers from the staged dir") {
    import graft.rules.{RuleRow, Rules, RuleStore}
    val path = tmp("rulestore_crash") + "/rules.json"
    val rows = Seq(
      RuleRow("r1", "ip_match", "1.2.3.4", 0, enabled = true, suspOnly = false,
        noDelay = false, None, "notify"),
      RuleRow("r2", "username_contains", "bot", 0, enabled = true, suspOnly = false,
        noDelay = false, None, "notify"))
    RuleStore.save(Rules.dfFor(spark, rows), path)
    // simulate the crash window: the staged write landed, the old store was
    // deleted, the rename never happened
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val hStaged = new org.apache.hadoop.fs.Path(path + ".staged")
    assert(fs.rename(hPath, hStaged), "fixture: move store to staged")
    assert(!fs.exists(hPath))
    // load finishes the swap and sees every rule
    val names = RuleStore.load(spark, path)
      .select("name").collect().map(_.getString(0)).toSet
    assert(names == Set("r1", "r2"))
    assert(fs.exists(hPath) && !fs.exists(hStaged), "swap must be completed")
  }
}
