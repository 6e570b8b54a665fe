package graft.text

import graft.Tables
import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over the
  * word co-occurrence graph — nodes = corpus vocabulary, undirected edges
  * weighted by adjacent-bigram frequency, rank redistributed proportional
  * to edge weight. The corpus-scale shape: ONE bigram aggregation over the
  * documents (vocab² bounded edge table, Zipf-small), then fixed cheap
  * iterations over the vocab-sized rank frame.
  *
  * All rank arithmetic in BIGINT nano-units with floor DIV (the
  * [[graft.web.WebOps.pageRank]] exact-integer scheme) so both engines
  * iterate bit-identically. Bound: `pr·850·wt` must stay under 2⁶³ —
  * pr ≤ 10⁹ (total mass), so edge weights up to ~10⁷ are safe; beyond
  * that, pre-scale weights (divide the whole edge table by a constant —
  * rank order is invariant).
  */
object TextRank {

  val trIters = 2
  val trTop = 20

  def textrank(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Tables(spark, sfDir).documents
      .select(Portable.words(col("text")).as("w"))
      .filter(size(col("w")) >= 2)
    // adjacent pairs; self-loops ("the the") dropped; mirrored to undirected
    val bigrams = w
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1)," +
          " i -> struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    // aggregate DIRECTED pairs first, then mirror the vocab²-bounded edge
    // table: the corpus-sized explode is scanned and shuffled ONCE —
    // mirroring raw occurrence rows would double both (and recompute the
    // explode per union branch). wt(a,b) = dir(a,b) + dir(b,a) either way.
    val dir = bigrams.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("wt")).persist()
    val edges = dir
      .union(dir.select(col("b").as("a"), col("a").as("b"), col("wt")))
      .groupBy(col("a"), col("b")).agg(sum(col("wt")).as("wt"))
    val outw = edges.groupBy(col("a")).agg(sum(col("wt")).as("ow"))
    val ewd = edges.join(outw, "a").persist()
    val nodes = edges.select(col("a").as("word")).distinct().persist()
    val n = nodes.count()
    var pr = nodes.select(col("word"), lit(1000000000L / n).as("pr"))
    val teleport = 150000000L / n
    (1 to trIters).foreach { _ =>
      val contrib = ewd.join(pr, col("a") === col("word"))
        .select(col("b"), expr("(pr * 850 * wt) DIV (1000 * ow)").as("c"))
        .groupBy(col("b")).agg(sum(col("c")).as("inflow"))
      // r10 OPT (guide §2.4): the old round closed with a nodes-wide LEFT
      // JOIN + coalesce(inflow, 0) — but the edge table is MIRRORED, so
      // contrib's b-side key set IS the node set (every node has an
      // in-edge): the join re-keyed the vocab frame every round for
      // nothing. contrib alone is the next rank frame — one fewer
      // exchange+join per iteration, identical ranks for any corpus
      // (Round10OpsSpec pins old-vs-new equality on a crafted graph).
      pr = contrib.select(col("b").as("word"),
        (lit(teleport) + col("inflow")).as("pr"))
    }
    pr.orderBy(col("pr").desc, col("word").asc).limit(trTop)
      .select(col("word"), col("pr"))
  }

  /** The recurrence unrolled (r0→r2); DuckDB BIGINT sums widen to HUGEINT,
    * so the final projection casts back. */
  val textrankSql: String = {
    def step(prev: String, next: String): String =
      s"""$next AS (
         |  SELECT d.word, 150000000 // (SELECT n FROM n) + coalesce(f.inflow, 0) AS pr
         |  FROM nodes d LEFT JOIN (
         |    SELECT e.b, sum((p.pr * 850 * e.wt) // (1000 * e.ow)) AS inflow
         |    FROM ewd e JOIN $prev p ON e.a = p.word
         |    GROUP BY e.b) f ON d.word = f.b)""".stripMargin
    s"""WITH wl AS (SELECT ${Portable.wordsSql} AS w FROM documents),
       |bi AS (
       |  SELECT w[i] AS a, w[i + 1] AS b
       |  FROM wl, LATERAL unnest(range(1, len(w))) t(i)
       |  WHERE w[i] <> w[i + 1]),
       |und AS (SELECT a, b FROM bi UNION ALL SELECT b, a FROM bi),
       |edges AS (SELECT a, b, count(*) AS wt FROM und GROUP BY 1, 2),
       |outw AS (SELECT a, sum(wt) AS ow FROM edges GROUP BY 1),
       |ewd AS (SELECT e.a, e.b, e.wt, o.ow FROM edges e JOIN outw o USING (a)),
       |nodes AS (SELECT DISTINCT a AS word FROM edges),
       |n AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT word, 1000000000 // (SELECT n FROM n) AS pr FROM nodes),
       |${step("r0", "r1")},
       |${step("r1", "r2")}
       |SELECT word, CAST(pr AS BIGINT) AS pr
       |FROM r2 ORDER BY pr DESC, word ASC LIMIT $trTop""".stripMargin
  }
}
