package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused pins for the round-10 optimization rewrites — each test pins the
  * EQUIVALENCE argument the rewrite rests on, on crafted inputs where the
  * old and new forms could diverge (the graded corpus never exercises the
  * degenerate branches).
  */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("labelprop: pick ∪ iso equals the labels-left-join form, including isolated nodes") {
    import spark.implicits._
    // crafted graph: a 3-cycle {1,2,3}, an edge pair {10,11}, and node 99
    // ISOLATED — exactly the case the removed per-round left join carried.
    val rawPairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L))
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L)
    val adj = (rawPairs ++ rawPairs.map(_.swap)).toDF("src", "dst")
    val docs = nodes.toDF("node")
    var oldLabels = docs.select(col("node"), col("node").as("lbl"))
    var newLabels = oldLabels
    val iso = docs
      .join(adj.select(col("src")), col("node") === col("src"), "left_anti")
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to 4) {
      def pick(labels: org.apache.spark.sql.DataFrame) = adj
        .join(labels, col("dst") === col("node"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(max_by(col("lbl"), struct(col("c"), -col("lbl"))).as("nlbl"))
      // old form: labels-wide left join + coalesce
      oldLabels = oldLabels.join(pick(oldLabels), col("node") === col("src"), "left")
        .select(col("node"), coalesce(col("nlbl"), col("lbl")).as("lbl"))
        .localCheckpoint(true)
      // new form (WebOps.labelProp): pick ∪ the once-computed isolated set
      newLabels = pick(newLabels)
        .select(col("src").as("node"), col("nlbl").as("lbl"))
        .unionAll(iso)
        .localCheckpoint(true)
    }
    val o = oldLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = newLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(n == o, "pick ∪ iso must equal the left-join form on every node")
    assert(n.contains((99L, 99L)), "the isolated node must survive with its own label")
  }

  test("textrank: contrib-only rank step equals the nodes-left-join form on mirrored edges") {
    import spark.implicits._
    // crafted word graph incl. a node ("e") reachable only via one mirror
    // direction and a heavy zipf-ish hub ("a") — the shapes where a missing
    // in-edge would make the two forms diverge if mirroring were broken
    val dirPairs = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L), ("d", "a", 5L), ("e", "a", 1L))
    val dir = dirPairs.toDF("a", "b", "wt")
    val edges = dir.union(dir.select(col("b").as("a"), col("a").as("b"), col("wt")))
      .groupBy(col("a"), col("b")).agg(sum(col("wt")).as("wt"))
    val outw = edges.groupBy(col("a")).agg(sum(col("wt")).as("ow"))
    val ewd = edges.join(outw, "a")
    val nodes = edges.select(col("a").as("word")).distinct()
    val n = nodes.count()
    val teleport = 150000000L / n
    var prOld = nodes.select(col("word"), lit(1000000000L / n).as("pr"))
    var prNew = prOld
    (1 to 2).foreach { _ =>
      def contrib(pr: org.apache.spark.sql.DataFrame) =
        ewd.join(pr, col("a") === col("word"))
          .select(col("b"), expr("(pr * 850 * wt) DIV (1000 * ow)").as("c"))
          .groupBy(col("b")).agg(sum(col("c")).as("inflow"))
      prOld = nodes.join(contrib(prOld), col("word") === col("b"), "left")
        .select(col("word"), (lit(teleport) + coalesce(col("inflow"), lit(0L))).as("pr"))
      prNew = contrib(prNew).select(col("b").as("word"), (lit(teleport) + col("inflow")).as("pr"))
    }
    val o = prOld.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val nw = prNew.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(nw == o, "mirrored edges mean contrib covers every node — forms must agree")
    assert(o.map(_._1) == Set("a", "b", "c", "d", "e"))
  }

  test("fuzzy join: a 1-deletion variant match always has levenshtein exactly 1") {
    // the r10 narrowing dropped cname (and the levenshtein belt) from the
    // variant index on the argument that dname = v ⇒ distance(dname, cname)
    // is exactly 1; pin that argument on names with repeated characters
    // (zero-runs — the case where several deletions yield the same variant)
    val names = Seq("Customer#000000100", "aaaa", "abc", "a")
    for (cname <- names; pos <- 1 to cname.length) {
      val v = cname.substring(0, pos - 1) + cname.substring(pos)
      val d = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(v, cname)
      assert(d == 1, s"deletion variant '$v' of '$cname' must sit at distance 1")
    }
  }

  test("fuzzy join: narrowed variant index yields the same matches as the belt-filtered form") {
    import spark.implicits._
    val canon = Seq((5L, "Customer#000000005"), (10L, "Customer#000000010"),
      (15L, "Customer#000000015"), (20L, "Customer#000000020"),
      (25L, "Customer#000000025")).toDF("ck", "cname")
    def variantsOf(wide: Boolean) = {
      val base = canon
        .select(col("ck"), col("cname"),
          explode(sequence(lit(1), length(col("cname")))).as("pos"))
        .select(col("ck"), col("cname"),
          concat(expr("substring(cname, 1, pos - 1)"),
            expr("substring(cname, pos + 1, length(cname))")).as("v"))
      if (wide) base.distinct() else base.drop("cname").distinct()
    }
    val dirty = canon.filter(col("ck") % 5 === 0)
      .withColumn("p", (col("ck") % 9 + 10).cast("int"))
      .select(col("ck").as("dk"),
        concat(expr("substring(cname, 1, p - 1)"),
          expr("substring(cname, p + 1, length(cname))")).as("dname"))
    val old = dirty.join(variantsOf(wide = true), col("dname") === col("v"))
      .filter(expr("levenshtein(dname, cname) = 1"))
      .groupBy(col("dk"), col("dname"))
      .agg(count(lit(1)).as("n_matches"), min(col("ck")).as("best_ck"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val neu = dirty.join(variantsOf(wide = false), col("dname") === col("v"))
      .groupBy(col("dk"), col("dname"))
      .agg(count(lit(1)).as("n_matches"), min(col("ck")).as("best_ck"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(neu == old, "dropping cname + the always-true belt must not change matches")
    assert(neu.nonEmpty, "fixture must actually produce matches")
  }
}
