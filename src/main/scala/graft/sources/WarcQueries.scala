package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable WARC ingestion row (SURVEY §2a #17c).
  *
  * [[Warc]] is the engine's Common Crawl intake — an ingestion bug there
  * corrupts every downstream corpus operator, so the parse gets a
  * correctness row, not just specs: a deterministic WARC fixture is built
  * byte-by-byte in-query (one gzip member per record, Common Crawl layout,
  * plus a plain bare-LF file and a truncated dirty tail), run through the
  * REAL Spark path ([[Warc.read]]: binaryFile → per-partition lazy
  * iterator), and compared against a hand-verified VALUES oracle whose
  * lengths/digests are derived from the payload byte definitions —
  * independently of the parser under test (pattern:
  * [[graft.commands.CommandQueries]] cmd_parse).
  */
object WarcQueries {

  /** One ISO 28500 record: version line, envelope headers, Content-Length,
    * blank line, payload, two record-terminator newlines. `crlf=false`
    * emits bare-LF line endings (dirty captures use both; the parser
    * tolerates either). */
  private[graft] def record(warcType: String, uri: String, ctype: String,
      payload: Array[Byte], crlf: Boolean = true, date: String = ""): Array[Byte] = {
    val nl = if (crlf) "\r\n" else "\n"
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(nl)
    sb.append("WARC-Type: ").append(warcType).append(nl)
    if (uri.nonEmpty) sb.append("WARC-Target-URI: ").append(uri).append(nl)
    if (date.nonEmpty) sb.append("WARC-Date: ").append(date).append(nl)
    if (ctype.nonEmpty) sb.append("Content-Type: ").append(ctype).append(nl)
    sb.append("Content-Length: ").append(payload.length).append(nl).append(nl)
    sb.toString.getBytes(US_ASCII) ++ payload ++ (nl + nl).getBytes(US_ASCII)
  }

  private[graft] def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  // The fixture payloads. The oracle's n_bytes and payload_md5 literals are
  // derived from THESE byte strings (python hashlib over the same bytes),
  // not from running the parser — the VALUES stay an independent oracle.
  private val m0 = "software: graft-warc/1.0\r\n".getBytes(US_ASCII)
  private val m1 = "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(US_ASCII)
  private val m2 = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" +
    "hello warc body").getBytes(US_ASCII)
  private val m3 = "hello extracted text".getBytes(US_ASCII)
  private val p0 = "fetchTimeMs: 22".getBytes(US_ASCII)
  private val p1 = "HTTP/1.1 404 Not Found\r\n\r\nmissing".getBytes(US_ASCII)

  /** Common Crawl layout: one gzip member per record, members concatenated.
    * The FINAL member is cut mid-payload — a truncated segment tail, the
    * dirtiest common real-world case: the parser must surface records 0–3
    * and drop the tail record loudly, never fail the file. */
  private[graft] def multiBlob: Array[Byte] =
    gz(record("warcinfo", "", "application/warc-fields", m0)) ++
      gz(record("request", "http://example.com/a",
        "application/http;msgtype=request", m1)) ++
      gz(record("response", "http://example.com/a",
        "application/http;msgtype=response", m2)) ++
      gz(record("conversion", "http://example.com/a", "text/plain", m3)) ++
      gz(record("response", "http://example.com/tail", "application/http",
        Array.fill[Byte](40)('x'))).dropRight(30)

  /** Plain (uncompressed) WARC with bare-LF line endings throughout. */
  private[graft] def plainBlob: Array[Byte] =
    record("metadata", "http://example.com/b", "application/warc-fields",
      p0, crlf = false) ++
      record("response", "http://example.com/b",
        "application/http;msgtype=response", p1, crlf = false)

  /** One fixture directory per JVM (the blobs are deterministic, so reuse
    * is sound); files registered deleteOnExit so repeated bench/verify runs
    * don't accumulate temp directories. */
  private lazy val fixtureDir: java.nio.file.Path = {
    val dir = Files.createTempDirectory("graft_warcq")
    val multi = Files.write(dir.resolve("multi.warc.gz"), multiBlob)
    val plain = Files.write(dir.resolve("plain.warc"), plainBlob)
    Seq(multi, plain, dir).foreach(_.toFile.deleteOnExit())
    dir
  }

  /** Parse the fixture through the real Spark binding and emit one row per
    * surviving record. */
  def warcRecords(spark: SparkSession, sfDir: String): DataFrame = {
    Warc.read(spark, fixtureDir.toString).toDF()
      .select(
        element_at(split(col("file"), "/"), -1).as("file"),
        col("recordIndex").cast("long").as("record_index"),
        col("warcType").as("warc_type"),
        col("targetUri").as("target_uri"),
        col("contentType").as("content_type"),
        col("nBytes").as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
  }

  /** Hand-verified expected records: the truncated tail member of
    * multi.warc.gz is absent; lengths and md5 digests computed from the
    * payload definitions above with an independent tool. */
  val warcRecordsSql: String =
    """SELECT file, CAST(record_index AS BIGINT) AS record_index, warc_type,
      |  target_uri, content_type, CAST(n_bytes AS BIGINT) AS n_bytes, payload_md5
      |FROM (VALUES
      |  ('multi.warc.gz', 0, 'warcinfo', '', 'application/warc-fields', 26, '4abdc7ad35d6470fdbcf94846a40bd68'),
      |  ('multi.warc.gz', 1, 'request', 'http://example.com/a', 'application/http;msgtype=request', 38, 'd6cf5b60ba12816ad78005a3dc4eb2f6'),
      |  ('multi.warc.gz', 2, 'response', 'http://example.com/a', 'application/http;msgtype=response', 60, '1114fe608a390c1467b7f966f85dee66'),
      |  ('multi.warc.gz', 3, 'conversion', 'http://example.com/a', 'text/plain', 20, '8be4959a0b812aded420b30ce412d5c2'),
      |  ('plain.warc', 0, 'metadata', 'http://example.com/b', 'application/warc-fields', 15, 'f82e2852716a87e93209b08e3a271ae5'),
      |  ('plain.warc', 1, 'response', 'http://example.com/b', 'application/http;msgtype=response', 33, '23da88f9cab7ee6cd1f132df3e777655')
      |) t(file, record_index, warc_type, target_uri, content_type, n_bytes, payload_md5)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "warc_records" -> (warcRecords _))

  def oracleSql: Map[String, String] = Map(
    "warc_records" -> warcRecordsSql)
}
