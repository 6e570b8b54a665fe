package graft.rules

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rule persistence (reference rules.rs:26-47: rules live in a JSON file,
  * rewritten on every mutation).
  *
  * The Spark-native store is a single-partition JSON dataset — human-
  * readable like the reference's rules.json, atomic via overwrite, and
  * loadable straight into the broadcast dim the engine joins against.
  * Lifecycle mutations (add/remove/enable/disable/renew) are pure DataFrame
  * transforms: load → transform → save.
  */
object RuleStore {

  def save(rules: DataFrame, path: String): Unit =
    rules.coalesce(1).write.mode("overwrite").json(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(
      "name STRING, kind STRING, pattern STRING, num_arg INT, enabled BOOLEAN, " +
        "susp_only BOOLEAN, no_delay BOOLEAN, expiry_us LONG, actions STRING")
      .json(path)

  /** `signup rules add` — refuses duplicate names (rules.rs:49-57). */
  def add(rules: DataFrame, rule: RuleRow, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val newDf = Seq((rule.name, rule.kind, rule.pattern, rule.numArg, rule.enabled,
      rule.suspOnly, rule.noDelay, rule.expiryUs, rule.actions))
      .toDF("name", "kind", "pattern", "num_arg", "enabled", "susp_only",
        "no_delay", "expiry_us", "actions")
    rules.unionByName(newDf.join(rules.select("name"), Seq("name"), "left_anti"))
  }

  def remove(rules: DataFrame, name: String): DataFrame =
    rules.filter(col("name") =!= name)

  def setEnabled(rules: DataFrame, namePattern: String, enabled: Boolean): DataFrame =
    rules.withColumn("enabled",
      when(col("name").rlike(namePattern), lit(enabled)).otherwise(col("enabled")))

  def renew(rules: DataFrame, name: String, newExpiryUs: Long): DataFrame =
    rules.withColumn("expiry_us",
      when(col("name") === name, lit(newExpiryUs)).otherwise(col("expiry_us")))

  /** Expiry sweep (eventhandler.rs:418-480): drop rules >3 days past expiry. */
  def sweep(rules: DataFrame, nowUs: Long): DataFrame =
    rules.filter(col("expiry_us").isNull ||
      lit(nowUs) <= col("expiry_us") + lit(3L * 86400L * 1000000L))
}
