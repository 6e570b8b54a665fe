package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet footer introspection — the zone-map audit.
  *
  * Every scan-pruning claim this engine makes (q_zorder's clustered
  * rectangles, partition pruning, min/max row-group skipping) rests on the
  * statistics parquet writers put in the footer; [[footerStats]] reads
  * them back as a table (one row per row group × audited column), and the
  * graded query [[srcParquetStats]] folds them to per-column totals whose
  * oracle is a DATA recount — if the footer decode were wrong in any way
  * the fold could not reproduce what a full scan sees, which is precisely
  * the zone-map soundness property ("trusting the stats skips no rows").
  * Per-row-group granularity is deliberately NOT in the graded output: the
  * row-group layout is the WRITER's choice (driver-owned files — the
  * round-4 lesson), so the gate pins footer-vs-data agreement, not layout.
  *
  * Scale shape: footers only — O(row groups), zero data-page IO. The
  * footer walk runs driver-side over the bounded file listing (the
  * MaxMind-dim posture: metadata is dim-sized by construction; at 100 TB
  * the same walk distributes as a mapPartitions over the file list, same
  * output contract). Audited columns are INT64 so min/max render
  * identically across engines (binary/double stats have engine-specific
  * renderings; integer stats cannot).
  */
object ParquetStats {

  /** Tables × INT64 key columns audited by the query. */
  val audited: Seq[(String, Seq[String])] = Seq(
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"))

  /** One row per (table, audited column, row group): value/null counts and
    * the footer's min/max — the raw zone map. */
  def footerStats(spark: SparkSession, sfDir: String): DataFrame = {
    val conf = new Configuration()
    val rows = audited.flatMap { case (table, cols) =>
      val want = cols.toSet
      val in = HadoopInputFile.fromPath(new Path(s"$sfDir/$table.parquet"), conf)
      val reader = ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks
        (0 until blocks.size()).flatMap { rg =>
          val block = blocks.get(rg)
          (0 until block.getColumns.size()).flatMap { ci =>
            val cc = block.getColumns.get(ci)
            val name = cc.getPath.toDotString
            if (!want(name)) None
            else {
              val st = cc.getStatistics
              Some((table, name, rg.toLong, cc.getValueCount,
                st.getNumNulls,
                st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                st.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
            }
          }
        }
      } finally reader.close()
    }
    import spark.implicits._
    rows.toDF("table_name", "col_name", "row_group", "n_values", "n_nulls",
      "min_v", "max_v")
  }

  /** The graded fold: per (table, column), totals and global min/max FROM
    * THE FOOTERS ALONE; the oracle recounts the same numbers from the
    * data, so a footer-decode defect cannot hash-match. */
  def srcParquetStats(spark: SparkSession, sfDir: String): DataFrame =
    footerStats(spark, sfDir)
      .groupBy(col("table_name"), col("col_name"))
      .agg(sum(col("n_values")).as("n_values"),
        sum(col("n_nulls")).as("n_nulls"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  val srcParquetStatsSql: String =
    audited.flatMap { case (table, cols) =>
      cols.map { c =>
        s"""SELECT '$table' AS table_name, '$c' AS col_name,
           |  CAST(count($c) AS BIGINT) AS n_values,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(min($c) AS BIGINT) AS min_v, CAST(max($c) AS BIGINT) AS max_v
           |FROM $table""".stripMargin
      }
    }.mkString("\nUNION ALL\n")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_parquet_stats" -> (srcParquetStats _))

  def oracleSql: Map[String, String] = Map(
    "src_parquet_stats" -> srcParquetStatsSql)
}
