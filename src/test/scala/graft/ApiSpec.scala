package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.scalatest.funsuite.AnyFunSuite

class ApiSpec extends AnyFunSuite {
  import SparkTest._

  test("extensions register shingle_hashes and vector_dot for SQL") {
    graft.plans.GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT shingle_hashes('a b c d', 3, true, ''), vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head
    assert(r.getSeq[Long](0).length == 2)
    assert(r.getDouble(1) == 11.0)
  }

  test("rule store: save/load/add/remove/sweep roundtrip") {
    val dir = java.nio.file.Files.createTempDirectory("rules").toString + "/rules.json"
    val rules = graft.rules.Rules.df(spark)
    graft.rules.RuleStore.save(rules, dir)
    val loaded = graft.rules.RuleStore.load(spark, dir)
    assert(loaded.count() == rules.count())
    val added = graft.rules.RuleStore.add(loaded,
      graft.rules.RuleRow("r_new", "username_contains", "xyz", 0, enabled = true,
        suspOnly = false, noDelay = false, None, "notify"), spark)
    assert(added.count() == rules.count() + 1)
    // duplicate add refused
    val dup = graft.rules.RuleStore.add(added,
      graft.rules.RuleRow("r_new", "ip_match", "1.1.1.1", 0, enabled = true,
        suspOnly = false, noDelay = false, None, "close"), spark)
    assert(dup.count() == added.count())
    assert(graft.rules.RuleStore.remove(added, "r_new").count() == rules.count())
    // sweep drops r_expired (expiry 2024-01-01 is >3d before the fixed now)
    val swept = graft.rules.RuleStore.sweep(loaded, graft.rules.Rules.nowUs)
    assert(swept.filter("name = 'r_expired'").count() == 0)
    assert(swept.filter("name = 'r_ip'").count() == 1)
  }

  test("namechk runs hypothetical signup through the engine") {
    val hits = graft.rules.RuleEngine.namechk(spark, "user_242424", graft.rules.Rules.df(spark))
      .collect().map(_.getString(0)).toSet
    // username_regex 'user_[0-9]*[02468]$' matches an even-digit name;
    // r_susp needs susp_ip=false -> excluded; email/ip rules don't match the
    // synthetic qwe@asd.zxc / 127.0.0.1
    assert(hits.contains("r_user_regex"))
    assert(!hits.contains("r_susp"))
    assert(!hits.contains("r_email_contains"))
  }

  test("ndjson socket ingest: parse, malformed drop, signup filter") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    val lines = Seq(
      """{"t":"signup","username":"alice","email":"a@x.io","ip":"1.2.3.4","userAgent":"curl/7.1","suspIp":true}""",
      """not json at all""",
      """{"t":"other","username":"bob","email":"b@x.io","ip":"2.3.4.5"}""",
      """{"t":"signup","username":"carol","email":"c@y.io","ip":"5.6.7.8"}""")
    val feeder = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      Thread.sleep(3000)
      sock.close(); server.close()
    })
    feeder.setDaemon(true)
    feeder.start()

    val df = graft.streaming.NdjsonIngest.fromSocket(spark, "localhost", port)
    val q = df.writeStream.format("memory").queryName("ndjson_test")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 20000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.table("ndjson_test").collect()
        if (rows.length < 2) Thread.sleep(200)
      }
      val users = rows.map(_.getAs[String]("username")).toSet
      assert(users == Set("alice", "carol"), s"got $users")
      val alice = rows.find(_.getAs[String]("username") == "alice").get
      assert(alice.getAs[Boolean]("susp_ip"))
      val carol = rows.find(_.getAs[String]("username") == "carol").get
      assert(!carol.getAs[Boolean]("susp_ip"), "missing suspIp defaults false")
    } finally q.stop()
  }
}
