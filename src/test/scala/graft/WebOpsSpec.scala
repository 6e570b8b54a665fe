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

  test("htmlLinkList: all three quoting forms in doc order, non-href anchors skipped") {
    val html = "<A HREF='one'>1</A><a name=\"x\">n</a>" +
      "<a rel=\"nofollow\" href=\"two\">2</a><a href=three>3</a>"
    assert(WebOps.htmlLinkList(html).toSeq == Seq("one", "two", "three"))
    assert(WebOps.htmlLinkList("no anchors").isEmpty)
  }

  test("htmlAnchorList: hrefs are a sub-sequence of htmlLinkList on generated HTML") {
    // anchors come only from CLOSED <a> elements, so every (href) the
    // anchor extractor sees must appear in htmlLinkList, in order — on
    // arbitrary generated markup, not just the fixture
    val word = Gen.alphaNumStr.map(_.take(5)).suchThat(_.nonEmpty)
    val anchorGen = for {
      href <- word
      txt <- Gen.oneOf(Gen.const(""), word, word.map(w => s"<b>$w</b> x"))
      closed <- Gen.frequency(4 -> true, 1 -> false)
      quote <- Gen.oneOf("\"", "'", "")
      attr <- Gen.oneOf("", " class=\"x\"", " rel=nofollow")
    } yield s"<a$attr href=$quote$href.html$quote>" +
      (if (closed) s"$txt</a>" else txt)
    val htmlGen = for {
      parts <- Gen.listOf(Gen.oneOf(anchorGen, word, Gen.const("<a name=\"n\">t</a>")))
    } yield parts.mkString(" ")
    check(Prop.forAll(htmlGen) { html =>
      val anchors = WebOps.htmlAnchorList(html).map(_._1).toList
      val links = WebOps.htmlLinkList(html).toList
      // sub-sequence check: anchors in order within links
      def isSubseq(a: List[String], l: List[String]): Boolean = (a, l) match {
        case (Nil, _) => true
        case (_, Nil) => false
        case (x :: xs, y :: ys) => if (x == y) isSubseq(xs, ys) else isSubseq(a, ys)
      }
      isSubseq(anchors, links) &&
        WebOps.htmlAnchorList(html).forall { case (_, t) =>
          t == t.trim && !t.contains("<") }
    })
  }

  test("resolveUrl: each documented rule") {
    val base = "https://example.com/dir/page.html"
    assert(WebOps.resolveUrl(base, "") == null)                       // rule 1
    assert(WebOps.resolveUrl(base, "#sec") == null)                   // rule 1
    assert(WebOps.resolveUrl(base, "http://a.org/x") == "http://a.org/x") // rule 2
    assert(WebOps.resolveUrl(base, "mailto:a@b") == null)             // rule 2
    assert(WebOps.resolveUrl(base, "javascript:void(0)") == null)     // rule 2
    assert(WebOps.resolveUrl(base, "//cdn.net/l.js") == "https://cdn.net/l.js") // rule 3
    assert(WebOps.resolveUrl(base, "/abs.html") == "https://example.com/abs.html") // rule 4
    assert(WebOps.resolveUrl(base, "rel.html") == "https://example.com/dir/rel.html") // rule 5
    assert(WebOps.resolveUrl(base, "../up.html") == "https://example.com/up.html")
    assert(WebOps.resolveUrl(base, "../../../over.html") == "https://example.com/over.html")
    assert(WebOps.resolveUrl(base, "./a/./b/../c?q=1#f") == "https://example.com/dir/a/c?q=1")
    assert(WebOps.resolveUrl("https://example.com", "x.html") == "https://example.com/x.html")
    assert(WebOps.resolveUrl("not a url", "x.html") == null)
  }

  test("resolveUrl output is absolute: resolving it against any base is identity") {
    val bases = Gen.oneOf("https://example.com/a/b.html", "http://h.net", "https://x.io/d/")
    val refs = Gen.oneOf("p.html", "../q", "/r/s", "//cdn.net/t", "a/../b", "./c")
    check(Prop.forAll(bases, refs, bases) { (b, r, b2) =>
      val abs = WebOps.resolveUrl(b, r)
      abs != null && WebOps.resolveUrl(b2, abs) == abs
    })
  }

  test("link expressions keep the WholeStageCodegen span; null ref handling") {
    val df = spark.range(3).select(
      explode(WebOps.htmlLinks(
        concat(lit("<a href=\"/p"), col("id"), lit("\">x</a>")))).as("href"))
      .select(WebOps.urlResolve(lit("https://e.com/d/"), col("href")).as("abs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(500))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("https://e.com/p0", "https://e.com/p1", "https://e.com/p2"))
    // a frontier-dropped ref is SQL null end to end (generated path)
    val dropped = spark.range(1).select(
      WebOps.urlResolve(lit("https://e.com/"), lit("#top")).as("abs")).collect()
    assert(dropped.head.isNullAt(0))
  }

  test("web_frontier: real extraction feeds the policy; rules dim broadcast") {
    val f = WebOps.frontier(spark, SparkTest.sf)
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "rules must broadcast:\n" + plan.take(600))
    val verdicts = f.collect().map(r =>
      (r.getLong(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(verdicts((4L, "https://example.com/public/a.html")))       // /public/ beats /
    assert(!verdicts((4L, "https://example.com/public/tmp/x.html")))  // longest prefix denies
    assert(verdicts((4L, "https://example.com/dual/d")))              // tie -> Allow
    assert(!verdicts((0L, "https://example.com/root.html")))          // only / matches
    // out-of-scope hosts never reach the policy
    assert(!verdicts.keySet.exists(_._2.contains("other.org")))
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

  test("web_canonical: canonicals are absolute-canonical; self iff equal in canonical space") {
    val q = WebOps.canonicalTag(spark, sf)
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = q.collect()
    assert(rows.length == WebOps.canonicalCorpus.length)
    val urls = WebOps.canonicalCorpus.map { case (id, u, _) => id -> u }.toMap
    rows.foreach { r =>
      val canon = r.getString(1)
      assert(canon.startsWith("https://") || canon.startsWith("http://"))
      assert(canon == WebOps.canonicalUrl(canon), "canonical output must be a fixpoint")
      assert(r.getBoolean(2) ==
        (canon == WebOps.canonicalUrl(urls(r.getLong(0)))))
    }
    // the reversed-attribute form (fixture 3) really extracted
    assert(rows.find(_.getLong(0) == 3L).get.getString(1).endsWith("/master.html"))
  }

  test("web_feed: RSS and Atom normalize to one shape; zero shuffles") {
    val q = WebOps.feed(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
    val rows = q.collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(4)))
    assert(rows.length == 5)
    // CDATA title decodes; feed/channel-level titles never leak into items
    assert(rows.contains(("Second <b>post</b>", "https://example.com/posts/2", "")))
    assert(!rows.exists(_._1 == "Example Blog") && !rows.exists(_._1 == "Example Feed"))
    // Atom attribute-form link + whitespace-trimmed title; missing date is ''
    assert(rows.contains(("Atom two", "https://example.com/a/2", "")))
    // missing title is ''; both date dialects surface verbatim
    assert(rows.contains(("", "https://example.com/posts/3", "Tue, 03 Mar 2026 09:30:00 GMT")))
    assert(rows.contains(("Atom one", "https://example.com/a/1", "2026-03-01T12:00:00Z")))
  }
}
