package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused spec for the r9 `vector_mean` aggregate (plans/VectorMean.scala)
  * that replaced the posexplode + per-dim avg + collect_list repack inside
  * kmMeans / the PQ trained-codebook means. Pins:
  *   - value: elementwise mean equals the explode+avg form at the 6dp
  *     rounding every consumer applies;
  *   - distribution-invariance: the same answer at 1 and many partitions
  *     (partial buffers + merge + serde all exercised at many);
  *   - nulls are skipped like avg();
  *   - ragged inputs fail loudly (never silent truncation).
  */
class VectorMeanSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("vector_mean equals explode+avg at 6dp under any partitioning") {
    import spark.implicits._
    val rows = (1 to 257).map { i =>
      (i % 7L, Array.tabulate(5)(d => math.sin(i * 31 + d) * 1e3))
    }
    def meansOf(parts: Int): Map[Long, Seq[Double]] =
      rows.toDF("k", "v").repartition(parts)
        .groupBy(col("k"))
        .agg(graft.plans.VectorMean.vectorMean(col("v")).as("m"))
        .select(col("k"), transform(col("m"), x => round(x, 6)).as("m"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val viaExplode = rows.toDF("k", "v")
      .select(col("k"), posexplode(col("v")))
      .groupBy(col("k"), col("pos")).agg(round(avg(col("col")), 6).as("m"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    val one = meansOf(1)
    assert(one == viaExplode, "vector_mean must equal the explode+avg form")
    assert(meansOf(16) == one, "partition count must not change the 6dp mean")
  }

  test("null rows are skipped; all-null group yields null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(2.0, 4.0))), (1L, None), (1L, Some(Array(4.0, 8.0))),
      (2L, None)
    ).toDF("k", "v")
    val got = df.groupBy(col("k"))
      .agg(graft.plans.VectorMean.vectorMean(col("v")).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)
      == Some(Seq(3.0, 6.0)))
    assert(got(2L).isEmpty, "group with no non-null vectors must be null")
  }

  test("ragged inputs fail loudly") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 2.0)), (1L, Array(1.0, 2.0, 3.0))).toDF("k", "v")
    val ex = intercept[Exception] {
      df.groupBy(col("k"))
        .agg(graft.plans.VectorMean.vectorMean(col("v")).as("m")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => String.valueOf(c.getMessage).contains("ragged")),
      s"expected a ragged-input failure, got: $ex")
  }
}
