package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental-view-maintenance and content-defined-chunking invariants —
  * the properties the oracle hash check proves indirectly, pinned directly. */
class IvmCdcSpec extends AnyFunSuite {
  import SparkTest._

  test("q_incr_join: delta-rule view equals the single full join+agg") {
    val t = Tables(spark, sf)
    val full = t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val incr = relational.Relational.qIncrJoin(spark, sf)
      .collect().map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n_items")).toMap
    assert(incr == full, "Δ(A⋈B) decomposition must be disjoint and complete")
  }

  test("q_incr_join: the base⋈base term sees only pre-cutoff rows on both sides") {
    // the O(delta) claim rests on the standing view never touching post-cutoff
    // data; verify the split predicates partition both inputs exactly
    val t = Tables(spark, sf)
    val cut = lit(relational.Relational.incrCutoff).cast("timestamp")
    val o = t.orders.count()
    val oSplit = t.orders.filter(col("o_orderdate") < cut).count() +
      t.orders.filter(col("o_orderdate") >= cut).count()
    assert(o == oSplit)
    val l = t.lineitem.count()
    val lSplit = t.lineitem.filter(col("l_shipdate") < cut).count() +
      t.lineitem.filter(col("l_shipdate") >= cut).count()
    assert(l == lSplit)
    assert(t.orders.filter(col("o_orderdate") >= cut).count() > 0,
      "fixture must exercise a non-empty delta")
  }

  test("dd_cdc: chunks after the first boundary survive a front-of-doc insertion") {
    import spark.implicits._
    // varied vocabulary: ~199 distinct 2-grams → ~12 expected boundaries
    val base = (0 until 200).map(i => s"word$i").mkString(" ")
    val edited = "inserted words " + base
    val chunks = dedup.Dedup.cdcChunkTable(
        Seq((1L, base), (2L, edited)).toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("sig"))).toMap)
      .toMap
    val sigs1 = chunks(1L).values.toSet
    val c2 = chunks(2L)
    // fixed-size chunking would shift EVERY chunk; CDC must re-converge:
    // all doc-2 chunks except the first (which absorbed the insertion and,
    // via the changed 2-gram at the seam, possibly the second) reappear
    // verbatim in doc 1's chunk set
    val tail = c2.filter { case (idx, _) => idx >= 2 }.values
    assert(tail.nonEmpty, "fixture must produce >2 chunks")
    tail.foreach(s => assert(sigs1.contains(s),
      s"post-boundary chunk signature $s must survive the front insertion"))
  }

  test("dd_cdc: chunk index partitions positions contiguously from 0") {
    import spark.implicits._
    val df = dedup.Dedup.cdcChunkTable(
      Seq((7L, (0 until 150).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text"))
    val idxs = df.select("chunk_idx").as[Long].collect().sorted
    assert(idxs.head == 0L && idxs.zipWithIndex.forall { case (v, i) => v == i },
      "chunk indices must be dense 0..k")
  }
}
