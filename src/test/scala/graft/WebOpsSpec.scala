package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.web.WebOps

/** Web-crawl curation: URL canonicalization, HTML text extraction, integer
  * PageRank. */
class WebOpsSpec extends AnyFunSuite {
  import SparkTest._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  // ---- canonicalUrl --------------------------------------------------------

  test("canonicalUrl is idempotent on the fixture corpus") {
    WebOps.urlCorpus.foreach { u =>
      val c = WebOps.canonicalUrl(u)
      assert(WebOps.canonicalUrl(c) == c, s"not a fixed point: $u -> $c")
    }
  }

  test("canonicalUrl is idempotent on generated URLs") {
    val seg = Gen.alphaNumStr.map(_.take(6)).suchThat(_.nonEmpty)
    val urlGen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "Https", "ftp")
      host <- Gen.listOfN(2, seg).map(_.mkString("."))
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.listOf(seg).map(ps => if (ps.isEmpty) "" else ps.mkString("/", "/", ""))
      slash <- Gen.oneOf("", "/")
      params <- Gen.listOf(Gen.zip(
        Gen.oneOf("a", "b", "utm_source", "ref", "z"), seg).map { case (k, v) => s"$k=$v" })
      frag <- Gen.oneOf("", "#x")
    } yield s"$scheme://$host$port$path$slash" +
      (if (params.isEmpty) "" else params.mkString("?", "&", "")) + frag
    check(Prop.forAll(urlGen) { u =>
      val c = WebOps.canonicalUrl(u)
      WebOps.canonicalUrl(c) == c
    })
  }

  test("canonicalUrl passes non-URLs through unchanged") {
    Seq("", "no scheme here", "example.com/path?a=1", "a b c").foreach { s =>
      assert(WebOps.canonicalUrl(s) == s)
    }
  }

  // ---- htmlToText ----------------------------------------------------------

  test("htmlToText drops script/style content, keeps surrounding text") {
    val t = WebOps.htmlToText(
      "before<script>if (a < b) { alert('<div>x</div>'); }</script>after" +
        "<style>.x::before { content: \"<p>\"; }</style>end")
    assert(t == "before after end")
  }

  test("htmlToText never leaves a tag behind") {
    val htmls = Seq(
      "<a href=\"/x?a=1&amp;b=2\" title='q>'>link</a>",
      "<P CLASS=old>UPPER</P>",
      "<br/><br />text<hr>")
    htmls.foreach { h =>
      val t = WebOps.htmlToText(h)
      assert(!t.contains("<a") && !t.contains("<P") && !t.contains("<br"),
        s"tag survived: $h -> $t")
    }
  }

  test("htmlToText output has collapsed single-space whitespace") {
    check(Prop.forAll(Gen.listOf(Gen.oneOf("word", " ", "\n", "\t", "<b>", "</b>", "&amp;"))) { parts =>
      val t = WebOps.htmlToText(parts.mkString)
      !t.contains("  ") && !t.contains("\n") && t == t.trim
    })
  }

  test("htmlToText decodes the five XML entities, nbsp and numeric escapes") {
    assert(WebOps.htmlToText("&lt;&gt;&amp;&quot;&apos;&nbsp;&#9731;") == "<>&\"' ☃")
    // &amp; decodes LAST: &amp;lt; is the ESCAPED text "&lt;", not "<"
    assert(WebOps.htmlToText("&amp;lt;") == "&lt;")
  }

  // ---- expressions stay codegen'd -----------------------------------------

  test("url/html expressions keep the WholeStageCodegen span") {
    val df = spark.range(3).select(
      WebOps.urlCanonical(concat(lit("https://Example.com:443/p"), col("id"))).as("u"),
      WebOps.htmlText(concat(lit("<b>x</b>"), col("id"))).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(1)` prefix is the short-plan WholeStageCodegen marker; a
    // CodegenFallback expression would print an unstarred Project
    assert(plan.contains("*(1) Project"), plan.take(500))
    assert(df.collect().length == 3)
  }

  // ---- web_wet -------------------------------------------------------------

  test("web_wet: non-response records filtered, header-only message yields empty text") {
    val rows = WebOps.wetExtract(spark, sf).collect()
    assert(rows.length == 3) // warcinfo record excluded
    assert(rows.forall(!_.getAs[String]("wet_text").contains("HTTP/1.1")),
      "HTTP headers leaked into extracted text")
  }

  // ---- web_robots ----------------------------------------------------------

  test("web_robots: one verdict per url, rules dims broadcast") {
    spark.catalog.clearCache()
    val df = WebOps.robotsCheck(spark, sf)
    val rows = df.collect()
    assert(rows.length == WebOps.robotsUrls.length)
    assert(rows.map(_.getAs[Long]("url_id")).distinct.length == rows.length)
    // the rules dim rides broadcast joins; the only hash exchange is the
    // per-url window
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }

  test("web_robots: allow wins an equal-length tie, absent rules allow") {
    val byId = WebOps.robotsCheck(spark, sf).collect()
      .map(r => r.getAs[Long]("url_id") -> r.getAs[Boolean]("allowed")).toMap
    assert(byId(10L), "equal-length Allow/Disallow tie must resolve to allow")
    assert(byId(9L), "agent with no rules and no * match must be allowed")
    assert(!byId(8L), "root Disallow must deny /")
  }

  // ---- pageRank ------------------------------------------------------------

  test("web_pagerank conserves rank mass within the floor-division loss bound") {
    val ranks = WebOps.fullRanks(spark, sf)
    val n = Tables(spark, sf).documents.count()
    val total = ranks.agg(sum(col("pr"))).head.getLong(0)
    // per iteration, each of the ≤3n edge contributions and each of the n
    // teleport terms floors away < 1 nano-unit; carried losses compound
    // across iterations, plus the initial pr₀ floor per node
    val maxLoss = WebOps.prIters * ((WebOps.linksPerDoc + 1) * n + n) + n
    assert(total <= 1000000000L, s"mass created: $total")
    assert(total >= 1000000000L - maxLoss, s"lost more than floor bound: $total")
  }

  test("web_pagerank: in-degree drives rank — top node beats the uniform start") {
    val top = WebOps.pageRank(spark, sf).head
    val n = Tables(spark, sf).documents.count()
    assert(top.getAs[Long]("pr") > 1000000000L / n)
  }
}
