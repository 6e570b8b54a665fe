package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] = Seq(
    (relational.Relational.queries, relational.Relational.oracleSql),
    (events.EventOps.queries, events.EventOps.oracleSql),
    (rules.RuleQueries.queries, rules.RuleQueries.oracleSql),
    (enrich.EnrichQueries.queries, enrich.EnrichQueries.oracleSql),
    (commands.CommandQueries.queries, commands.CommandQueries.oracleSql),
    (dedup.Dedup.queries, dedup.Dedup.oracleSql),
    (sim.Similarity.queries, sim.Similarity.oracleSql),
    (text.TextOps.queries, text.TextOps.oracleSql),
    (sample.Sampling.queries, sample.Sampling.oracleSql),
    (streaming.StreamOps.queries, streaming.StreamOps.oracleSql),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracleSql),
    (pipeline.Curate.queries, pipeline.Curate.oracleSql),
    (sources.WarcQueries.queries, sources.WarcQueries.oracleSql),
    (sources.CsvQueries.queries, sources.CsvQueries.oracleSql),
    (sources.ParquetStats.queries, sources.ParquetStats.oracleSql),
    (web.WebOps.queries, web.WebOps.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's identity in one plan: signups × broadcast rule dim →
    * matched (event, rule) pairs. */
  def entry(spark: SparkSession): DataFrame =
    rules.RuleQueries.queries("ru_engine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
