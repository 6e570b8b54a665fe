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
  * a lazy streaming record parser plus a Spark binding.
  *
  * Scale shape: the FILE is the parallelism unit (Common Crawl ships ~1 GB
  * segments, tens of thousands per dump — ample partitions), read via the
  * built-in `binaryFile` source so Spark's file listing/scheduling applies.
  * The COMPRESSED segment rides the binaryFile row; decoding is a lazy
  * ITERATOR — gzip members decompress through the stream (buffered on both
  * sides) and [[read]] consumes one record at a time, so live decompressed
  * memory is one header block + payload, never the multi-GiB decompressed
  * file. Dirty dumps are the norm: a truncated gzip member, cut-off
  * payload, or negative/absent Content-Length ends that FILE's iteration
  * with the records parsed so far (logged loud, never silent) instead of
  * failing the task — losing a segment to one bad record is worse than
  * dropping its tail.
  *
  * Multi-member gzip caveat: the JDK's `GZIPInputStream` probes for a
  * following member only while `available()` is positive, so feed
  * [[parseIterator]] byte-array or buffered-FILE streams (the Spark path
  * is one); a raw network stream may end early at a member boundary. */
object Warc {

  /** One parsed WARC record: envelope headers + raw payload bytes. */
  final case class WarcRecord(
      file: String,
      recordIndex: Int,
      warcType: String,
      targetUri: String, // "" when absent (WARC-Target-URI is optional)
      warcDate: String, // "" when absent (ISO 8601 in real archives)
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

  /** Lazy streaming parse of one WARC file (plain or gzip-member-
    * concatenated). Owns `raw`: the stream (and the gzip inflater's native
    * memory) is closed when iteration ends — exhaustion, malformed tail,
    * or IO error all close it — and `close()` covers early abandonment
    * (the Spark binding hooks it to task completion; standalone callers
    * that stop early should call it). Every dropped tail — structural or
    * IO — is LOGGED with the file and the count parsed so far; it is
    * never a silent truncation. */
  def parseIterator(file: String, raw: InputStream): Iterator[WarcRecord] with AutoCloseable =
    new Iterator[WarcRecord] with AutoCloseable {
      private var done = false
      private var pending: WarcRecord = _
      private var idx = 0
      private val in: InputStream =
        try {
          val pb = new PushbackInputStream(new BufferedInputStream(raw, 1 << 16), 2)
          val b1 = pb.read()
          if (b1 < 0) { finish(pb); pb }
          else {
            val b2 = pb.read()
            if (b2 >= 0) pb.unread(b2)
            pb.unread(b1)
            if (b1 == 0x1f && b2 == 0x8b)
              // buffer the DECOMPRESSED side too: header parsing reads
              // byte-at-a-time, and an unbuffered inflater pays a JNI
              // inflate call per byte
              new BufferedInputStream(new GZIPInputStream(pb, 1 << 16), 1 << 16)
            else pb
          }
        } catch {
          case e: java.io.IOException => dirty(raw, e); raw
        }

      private def finish(s: InputStream): Unit = {
        done = true
        try s.close() catch { case _: java.io.IOException => () }
      }
      // loud tail-drop (EVERY truncation path, structural or IO): a crawl
      // must be able to tell "clean file" from "segment lost 90% past a
      // corrupt member"
      private def truncated(s: InputStream, reason: String): Unit = {
        System.err.println(s"[warc] $file: stopping after $idx records: $reason")
        finish(s)
      }
      private def dirty(s: InputStream, e: java.io.IOException): Unit =
        truncated(s, String.valueOf(e.getMessage))

      /** Abandonment hook: closes the stream (and the gzip inflater's
        * native memory) when a consumer stops early — limit/take in the
        * Spark binding, or any standalone caller bailing out. Idempotent. */
      override def close(): Unit = finish(in)

      /** Next record, or null at end-of-walkable-input. */
      private def fetch(): WarcRecord =
        try {
          var line = readLine(in)
          while (line != null && !line.startsWith("WARC/")) line = readLine(in)
          if (line == null) { finish(in); null }
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
            if (h == null) { truncated(in, "truncated header block"); null }
            else headers.get("content-length").flatMap(_.toLongOption) match {
              case Some(len) if len >= 0 && len < Int.MaxValue - 8 =>
                val payload = in.readNBytes(len.toInt)
                if (payload.length < len) { truncated(in, "truncated payload"); null }
                else {
                  val r = WarcRecord(
                    file = file,
                    recordIndex = idx,
                    warcType = headers.getOrElse("warc-type", ""),
                    targetUri = headers.getOrElse("warc-target-uri", ""),
                    warcDate = headers.getOrElse("warc-date", ""),
                    contentType = headers.getOrElse("content-type", ""),
                    nBytes = len,
                    payload = payload)
                  idx += 1
                  r
                }
              case _ => // absent/negative/absurd length: unwalkable
                truncated(in, "missing or invalid Content-Length"); null
            }
          }
        } catch {
          case e: java.io.IOException => dirty(in, e); null
        }

      override def hasNext: Boolean = {
        if (!done && pending == null) pending = fetch()
        pending != null
      }
      override def next(): WarcRecord =
        if (hasNext) { val r = pending; pending = null; r }
        else Iterator.empty.next()
    }

  /** Materialized convenience over [[parseIterator]] (specs, small files). */
  def parseFile(file: String, bytes: Array[Byte]): Seq[WarcRecord] =
    parseIterator(file, new ByteArrayInputStream(bytes)).toVector

  /** All records under `path` as a typed Dataset. `binaryFile` carries the
    * whole (compressed) segment to its executor — the split unit; record
    * extraction is shuffle-free per-partition work consuming the LAZY
    * iterator, one decompressed record live at a time. */
  def read(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        val tc = org.apache.spark.TaskContext.get()
        // flatMap drains each file's iterator before opening the next, so at
        // most ONE is live; a single per-partition listener closing whichever
        // is current at task end covers downstream limit/take abandonment
        // (close is idempotent — a no-op for consumed files) without
        // accumulating a listener per FILE on a partition of many small files
        var current: AutoCloseable = null
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (current != null) current.close()
        }
        rows.flatMap { case (p, b) =>
          val it = parseIterator(p, new ByteArrayInputStream(b))
          current = it
          it
        }
      }
  }

  /** Split an HTTP message payload into (lower-cased headers, body).
    * Tolerates CRLF and bare-LF line endings (dirty captures use both);
    * a payload that is not an HTTP message (or whose headers never
    * terminate) comes back whole with no headers. */
  def httpMessage(payload: Array[Byte]): (Map[String, String], Array[Byte]) = {
    val head = new String(payload, 0, math.min(payload.length, 5), StandardCharsets.US_ASCII)
    if (!head.startsWith("HTTP/")) return (Map.empty, payload)
    var i = 0
    var bodyAt = -1
    var hdrEnd = -1
    while (bodyAt < 0 && i < payload.length - 1) {
      if (payload(i) == '\n') {
        if (payload(i + 1) == '\n') { hdrEnd = i; bodyAt = i + 2 }
        else if (payload(i + 1) == '\r' && i + 2 < payload.length && payload(i + 2) == '\n') {
          hdrEnd = i; bodyAt = i + 3
        }
      }
      i += 1
    }
    if (bodyAt < 0) return (Map.empty, payload)
    val headers = new String(payload, 0, hdrEnd, StandardCharsets.UTF_8)
      .split("\n").iterator.map(_.stripSuffix("\r")).drop(1)
      .flatMap { line =>
        line.indexOf(':') match {
          case -1 => None
          case c => Some(line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
            line.substring(c + 1).trim)
        }
      }.toMap
    (headers, java.util.Arrays.copyOfRange(payload, bodyAt, payload.length))
  }

  /** Body bytes of an HTTP message payload (headers dropped). */
  def httpBody(payload: Array[Byte]): Array[Byte] = httpMessage(payload)._2

  /** Decode HTTP chunked transfer encoding; malformed framing returns the
    * input unchanged (tolerance over loss, like the record parser). */
  private[graft] def dechunk(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length)
    var i = 0
    while (true) {
      // chunk-size line: hex, optional ";ext", CRLF/LF
      var j = i
      while (j < body.length && body(j) != '\n') j += 1
      if (j >= body.length) return body
      val sizeLine = new String(body, i, j - i, StandardCharsets.US_ASCII)
        .stripSuffix("\r").takeWhile(_ != ';').trim
      val size =
        try java.lang.Long.parseLong(sizeLine, 16)
        catch { case _: NumberFormatException => return body }
      if (size < 0 || size > Int.MaxValue) return body
      if (size == 0) return out.toByteArray // terminal chunk
      val start = j + 1
      if (start + size > body.length) return body
      out.write(body, start, size.toInt)
      i = start + size.toInt
      // skip the chunk's trailing CRLF / LF
      if (i < body.length && body(i) == '\r') i += 1
      if (i < body.length && body(i) == '\n') i += 1
    }
    body // unreachable
  }

  /** Decompress a gzip HTTP body (bounded by one record's payload);
    * corrupt data returns the input unchanged. */
  private[graft] def gunzipBody(body: Array[Byte]): Array[Byte] =
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(body), 1 << 16)
      try {
        // long math: an Int `length * 4` wraps negative at >= 512 MiB bodies
        val out = new java.io.ByteArrayOutputStream(
          math.min(body.length.toLong * 4, 1L << 24).toInt)
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    } catch { case _: java.io.IOException => body }

  /** WET projection: `conversion` records (Common Crawl's extracted-text
    * sidecar files) carry bare text payloads — no HTTP envelope to strip. */
  def conversions(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    read(spark, path)
      .filter(col("warcType") === "conversion")
      .map(r => (r.targetUri, new String(r.payload, StandardCharsets.UTF_8)))
  }

  /** The corpus-build projection: HTTP response records only, the HTTP
    * envelope stripped, chunked transfer framing and gzip content encoding
    * decoded, body as UTF-8 text (lossy for foreign charsets — charset
    * sniffing is a downstream concern) — the (uri, text) frame the
    * documents pipeline starts from. */
  def responses(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    read(spark, path)
      .filter(col("warcType") === "response")
      .map { r =>
        val (headers, raw) = httpMessage(r.payload)
        val unchunked =
          if (headers.get("transfer-encoding")
            .exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked"))) dechunk(raw)
          else raw
        val body =
          if (headers.get("content-encoding")
            .exists(_.toLowerCase(java.util.Locale.ROOT).contains("gzip"))) gunzipBody(unchunked)
          else unchunked
        (r.targetUri, new String(body, StandardCharsets.UTF_8))
      }
  }
}
