package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-checkable dirty-CSV ingestion row.
  *
  * The first mile of most real pipelines is delimited text with a dirty
  * tail: quoted delimiters, RFC 4180 escaped quotes, rows whose fields
  * don't parse, rows with the wrong arity. The reference's posture for its
  * own wire format is "drop malformed loudly, never die"
  * (eventstream.rs:40-62 skips `deserialize error` lines and counts on);
  * [[graft.events.EventOps.parseJson]] is that contract for JSON — this is
  * the same contract for CSV, through Spark's REAL csv reader in PERMISSIVE
  * mode with a corrupt-record column: well-formed fields survive even on a
  * partially bad row, and the quarantine column carries the raw line for
  * the dead-letter branch. A deterministic fixture (the WarcQueries
  * pattern) exercises each corner; the oracle is hand-traced RFC semantics
  * as VALUES, independent of the parser under test.
  *
  * Scale shape: CSV parsing is per-row, per-partition scan work — the file
  * splits on newlines and every partition parses independently, zero
  * shuffles; the quarantine branch is a filter on the same scan.
  */
object CsvQueries {

  /** Fixture lines: header; clean row; quoted delimiter; RFC 4180 escaped
    * quote; unparseable int; unparseable double; extra field; missing
    * field. No embedded newlines (that variant needs multiLine=true, which
    * trades away splittability — the scalable path keeps one record per
    * line). */
  private[sources] val fixtureCsv: String = Seq(
    "id,name,val",
    "1,alice,1.5",
    "2,\"smith, bob\",2.25",
    "3,\"says \"\"hi\"\"\",3.0",
    "oops,carol,4.5",
    "6,erin,notnum",
    "7,frank,7.75,extra",
    "8,gina").mkString("\n") + "\n"

  private lazy val fixtureDir: java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft_csvq")
    val f = Files.write(dir.resolve("dirty.csv"), fixtureCsv.getBytes(UTF_8))
    Seq(f, dir).foreach(_.toFile.deleteOnExit())
    dir
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("val", DoubleType),
    StructField("_raw", StringType)))

  /** Parse the fixture through the real reader; emit parsed fields plus the
    * quarantine verdict and raw line (null for clean rows). */
  def csvIngest(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      // Spark's DEFAULT escape is backslash; RFC 4180 escapes a quote by
      // doubling it — without this option `"says ""hi"""` survives wrapped
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_raw")
      .csv(fixtureDir.toString)
      .select(col("id"), col("name"), col("val"),
        col("_raw").isNotNull.as("quarantined"), col("_raw").as("raw"))

  /** Hand-traced RFC 4180 + PERMISSIVE-contract expectations: quoted
    * delimiters and doubled quotes unwrap; a field that fails its type
    * nulls THAT field and quarantines the raw line; wrong-arity rows keep
    * the fields that align and quarantine. */
  val csvIngestSql: String =
    """SELECT CAST(id AS BIGINT) AS id, name, CAST(val AS DOUBLE) AS val,
      |  quarantined, raw FROM (VALUES
      |  (1, 'alice', 1.5, false, NULL),
      |  (2, 'smith, bob', 2.25, false, NULL),
      |  (3, 'says "hi"', 3.0, false, NULL),
      |  (NULL, 'carol', 4.5, true, 'oops,carol,4.5'),
      |  (6, 'erin', NULL, true, '6,erin,notnum'),
      |  (7, 'frank', 7.75, true, '7,frank,7.75,extra'),
      |  (8, 'gina', NULL, true, '8,gina')
      |) t(id, name, val, quarantined, raw)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv" -> (csvIngest _))

  def oracleSql: Map[String, String] = Map(
    "src_csv" -> csvIngestSql)
}
