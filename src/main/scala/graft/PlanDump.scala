package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Dev tool: dump `.explain("formatted")` for queries to files.
  * args: <sfDir> <outDir> [comma-separated query names; default all]
  * Captures queryExecution.explainString on the BUILT DataFrame — for most
  * queries that is plan-only and cheap, but eager builders run real work
  * during the build itself (k-means/PQ training call count() per Lloyd
  * iteration; streaming harness rows run their query to completion inside
  * the builder), so plan capture for those executes substantial jobs and
  * the dumped plan is only the post-loop/post-drain tail. Used to commit
  * the plans/r{N}/<query>_{before,after}.txt optimization evidence.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
        } catch {
          case NonFatal(e) =>
            Files.writeString(Paths.get(s"$outDir/$name.txt"),
              s"PLAN FAILED: ${e.getClass.getName}: ${e.getMessage}\n")
        } finally spark.catalog.clearCache()
      }
    spark.stop()
  }
}
