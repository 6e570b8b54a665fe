package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (Web ARChive, ISO 28500) ingestion — the container format of
  * Common Crawl, the canonical 100 TB training-data source. The reference
  * ingests NDJSON over HTTP (eventstream.rs); a corpus build ingests WARC
  * dumps through the same engine, so the format gets first-class plumbing:
  * a pure streaming record parser plus a Spark binding.
  *
  * Scale shape: the FILE is the parallelism unit (Common Crawl ships ~1 GB
  * segments, tens of thousands per dump — ample partitions), read via the
  * built-in `binaryFile` source so Spark's file listing/scheduling applies.
  * The COMPRESSED segment rides the binaryFile row; decoding is STREAMING —
  * gzip members decompress through `GZIPInputStream` (which walks Common
  * Crawl's record-per-member concatenation) and live memory is bounded by
  * ONE record's header block + payload, never the multi-GiB decompressed
  * file. Dirty dumps are the norm: a truncated gzip member, cut-off
  * payload, or negative/absent Content-Length ends that FILE's stream with
  * the records parsed so far instead of failing the task — losing a
  * segment to one bad record is worse than dropping its tail. */
object Warc {

  /** One parsed WARC record: envelope headers + raw payload bytes. */
  final case class WarcRecord(
      file: String,
      recordIndex: Int,
      warcType: String,
      targetUri: String, // "" when absent (WARC-Target-URI is optional)
      contentType: String, // "" when absent
      nBytes: Long,
      payload: Array[Byte])

  /** One header/terminator line (CRLF or bare-LF ended), or null at EOF.
    * A line that never terminates within 1 MiB is a corrupt stream. */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      buf.write(c)
      if (buf.size > (1 << 20)) throw new java.io.IOException("unterminated header line")
      c = in.read()
    }
    val arr = buf.toByteArray
    val n = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1 else arr.length
    new String(arr, 0, n, StandardCharsets.UTF_8)
  }

  /** Streaming parse of one WARC file (plain or gzip-member-concatenated).
    * Pure — spec-testable without a SparkSession. Malformed or truncated
    * input yields the records parsed so far (see class doc). */
  def parseStream(file: String, raw: InputStream): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    try {
      val pb = new PushbackInputStream(new BufferedInputStream(raw, 1 << 16), 2)
      val b1 = pb.read()
      if (b1 < 0) return out.result()
      val b2 = pb.read()
      if (b2 >= 0) pb.unread(b2)
      pb.unread(b1)
      val in: InputStream =
        if (b1 == 0x1f && b2 == 0x8b) new GZIPInputStream(pb, 1 << 16) else pb
      var idx = 0
      var done = false
      while (!done) {
        // seek the next record head; skips inter-record CRLF padding (and,
        // tolerantly, any garbage between records)
        var line = readLine(in)
        while (line != null && !line.startsWith("WARC/")) line = readLine(in)
        if (line == null) done = true
        else {
          val headers = scala.collection.mutable.Map.empty[String, String]
          var h = readLine(in)
          while (h != null && h.nonEmpty) {
            val c = h.indexOf(':')
            if (c > 0)
              headers += h.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
                h.substring(c + 1).trim
            h = readLine(in)
          }
          if (h == null) done = true // truncated header block: drop tail
          else headers.get("content-length").flatMap(_.toLongOption) match {
            case Some(len) if len >= 0 && len < Int.MaxValue - 8 =>
              val payload = in.readNBytes(len.toInt)
              if (payload.length < len) done = true // truncated payload
              else {
                out += WarcRecord(
                  file = file,
                  recordIndex = idx,
                  warcType = headers.getOrElse("warc-type", ""),
                  targetUri = headers.getOrElse("warc-target-uri", ""),
                  contentType = headers.getOrElse("content-type", ""),
                  nBytes = len,
                  payload = payload)
                idx += 1
              }
            case _ => done = true // absent, negative, or absurd length: unwalkable
          }
        }
      }
    } catch {
      case _: java.io.IOException => () // truncated/corrupt member: keep what parsed
    }
    out.result()
  }

  /** Byte-array convenience over [[parseStream]]. */
  def parseFile(file: String, bytes: Array[Byte]): Seq[WarcRecord] =
    parseStream(file, new ByteArrayInputStream(bytes))

  /** All records under `path` as a typed Dataset. `binaryFile` carries the
    * whole (compressed) segment to its executor — the split unit; record
    * extraction is shuffle-free, streaming, per-partition work. */
  def read(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, b) => parseFile(p, b) })
  }

  /** Body of an HTTP message payload: a WARC `response` record holds the
    * raw HTTP response — status line, headers, blank line, body. Strips
    * the envelope when present; anything else passes through whole. */
  def httpBody(payload: Array[Byte]): Array[Byte] = {
    val head = new String(payload, 0, math.min(payload.length, 5), StandardCharsets.US_ASCII)
    if (!head.startsWith("HTTP/")) return payload
    var i = 0
    val last = payload.length - 4
    while (i <= last) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n')
        return java.util.Arrays.copyOfRange(payload, i + 4, payload.length)
      i += 1
    }
    payload // headers never terminated: surface the raw bytes
  }

  /** The corpus-build projection: HTTP response records only, the HTTP
    * envelope stripped, body decoded as UTF-8 (lossy for foreign charsets —
    * charset sniffing is a downstream concern) — the (uri, text) frame the
    * documents pipeline starts from. */
  def responses(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    read(spark, path)
      .filter(col("warcType") === "response")
      .map(r => (r.targetUri, new String(httpBody(r.payload), StandardCharsets.UTF_8)))
  }
}
