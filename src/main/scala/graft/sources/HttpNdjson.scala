package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.util
import javax.annotation.concurrent.GuardedBy

import scala.collection.mutable.ListBuffer

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom Structured Streaming source for HTTP chunked NDJSON / SSE feeds —
  * the reference's ingest loop (eventstream.rs:14-73: open a chunked HTTP
  * response, split on newlines, reconnect with a fixed backoff when the
  * stream drops) re-expressed as a DataSourceV2 `MicroBatchStream`.
  *
  * {{{
  *   spark.readStream.format("http-ndjson")
  *     .option("url", "http://host/api/stream/event")
  *     .option("mode", "ndjson")          // or "sse" (data: framing)
  *     .option("reconnectDelayMs", 7000)  // reference backoff, eventstream.rs:69
  *     .load()                            // => value STRING, recv_ts TIMESTAMP
  * }}}
  *
  * Like Spark's built-in text-socket source, this is a driver-buffered,
  * non-replayable source: a background thread owns the HTTP connection and
  * accumulates lines; each micro-batch drains a [start, end) slice by line
  * count, and `commit` trims the buffer. The production path for replayable
  * exactly-once ingest is Kafka in front of the feed; this connector is the
  * direct-tap equivalent of the reference's process.
  */
class HttpNdjsonSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "http-ndjson"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpNdjson.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpNdjsonTable(new CaseInsensitiveStringMap(properties))
}

object HttpNdjson {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("recv_ts", TimestampType)))
}

class HttpNdjsonTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"http-ndjson(${options.get("url")})"
  override def schema(): StructType = HttpNdjson.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HttpNdjson.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HttpNdjsonMicroBatchStream(
            url = Option(options.get("url")).getOrElse(
              throw new IllegalArgumentException("http-ndjson requires option 'url'")),
            sse = options.getOrDefault("mode", "ndjson").equalsIgnoreCase("sse"),
            reconnectDelayMs = options.getLong("reconnectDelayMs", 7000L),
            // silent-stream watchdog (status.rs: restart if no event for
            // 90 s): a read blocked longer than this times out and the
            // reader reconnects. 0 = wait forever.
            readTimeoutMs = options.getLong("silenceTimeoutMs",
              options.getLong("readTimeoutMs", 0L)).toInt,
            numPartitions = options.getInt("numPartitions", 2),
            maxLinesPerTrigger = options.getLong("maxLinesPerTrigger", Long.MaxValue),
            // EVENT-silence supervisor (status.rs:20-68): restart the
            // connection when no event arrived for this long, checked on a
            // fixed cadence (status.rs:73 pings every 15 s against a 90 s
            // threshold). Distinct from readTimeoutMs: SSE keepalive
            // comments reset a byte-level read timeout but are not events.
            // 0 = disabled.
            silenceRestartMs = options.getLong("silenceRestartMs", 0L),
            silenceCheckMs = options.getLong("silenceCheckMs", 15000L))
      }
    }
}

/** Line-count offset (monotonic over the life of the query). */
case class HttpLineOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class HttpNdjsonMicroBatchStream(
    url: String,
    sse: Boolean,
    reconnectDelayMs: Long,
    readTimeoutMs: Int,
    numPartitions: Int,
    maxLinesPerTrigger: Long,
    silenceRestartMs: Long = 0L,
    silenceCheckMs: Long = 15000L) extends MicroBatchStream with Logging {

  private val lock = new Object
  // lines [baseOffset, baseOffset + buffer.size); commit(n) trims below n
  @GuardedBy("lock") private val buffer = new ListBuffer[(String, Long)]
  @GuardedBy("lock") private var baseOffset = 0L
  // rate-limit window tracks the last PLANNED end, not the committed base:
  // Spark commits batch N only after planning N+1, so capping against the
  // committed offset would freeze the stream after one micro-batch
  @GuardedBy("lock") private var plannedEnd = 0L
  @GuardedBy("lock") private var connects = 0
  @volatile private var stopped = false
  @volatile private var lastError: Throwable = _
  @volatile private var consecutiveFailures = 0
  @volatile private var conn: HttpURLConnection = _

  /** Reconnect count — observable for tests and monitoring. */
  def connectCount: Int = lock.synchronized(connects)

  // ---- event-silence supervisor (status.rs:20-68) --------------------------
  // Tracks the last EVENT (offered line), not the last byte: a connection
  // kept alive by SSE comments or TCP keepalives while the feed is dead is
  // exactly the failure the reference's status loop restarts on.
  @volatile private var lastEventAtMs = System.currentTimeMillis()
  @volatile private var silenceRestartsCount = 0

  /** Watchdog-forced restarts — observable for tests and monitoring. */
  def silenceRestarts: Int = silenceRestartsCount

  private val watchdog: Option[Thread] =
    if (silenceRestartMs <= 0) None
    else Some(new Thread(s"http-ndjson-watchdog-$url") {
      setDaemon(true)
      override def run(): Unit = {
        while (!stopped) {
          try Thread.sleep(silenceCheckMs)
          catch { case _: InterruptedException => return }
          if (!stopped &&
              System.currentTimeMillis() - lastEventAtMs > silenceRestartMs) {
            logWarning(s"http-ndjson: no event for >$silenceRestartMs ms — " +
              "restarting event stream watcher")
            silenceRestartsCount += 1
            lastEventAtMs = System.currentTimeMillis() // status.rs:38 resets the clock
            val c = conn
            if (c != null) c.disconnect() // reader loop reconnects after backoff
          }
        }
      }
    })

  private val reader = new Thread(s"http-ndjson-$url") {
    setDaemon(true)
    override def run(): Unit = {
      while (!stopped) {
        try {
          val c = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
          conn = c
          c.setReadTimeout(readTimeoutMs)
          c.setRequestProperty("Accept",
            if (sse) "text/event-stream" else "application/x-ndjson")
          val in = new BufferedReader(
            new InputStreamReader(c.getInputStream, StandardCharsets.UTF_8))
          lock.synchronized { connects += 1 }
          consecutiveFailures = 0
          lastEventAtMs = System.currentTimeMillis() // fresh connection, fresh clock
          try {
            val dataAcc = new StringBuilder // SSE: accumulated data: lines
            var line = in.readLine()
            while (line != null && !stopped) {
              if (sse) {
                // SSE framing (WHATWG spec): "data:" lines accumulate; a blank
                // line dispatches the event; ":" comments and other fields skip.
                if (line.isEmpty) {
                  if (dataAcc.nonEmpty) { offer(dataAcc.result()); dataAcc.clear() }
                } else if (line.startsWith("data:")) {
                  if (dataAcc.nonEmpty) dataAcc.append('\n')
                  dataAcc.append(line.stripPrefix("data:").stripPrefix(" "))
                }
              } else if (line.nonEmpty) offer(line)
              line = in.readLine()
            }
            if (sse && dataAcc.nonEmpty) offer(dataAcc.result())
          } finally {
            in.close(); c.disconnect()
          }
        } catch {
          case e: Throwable if !stopped =>
            lastError = e
            consecutiveFailures += 1
            // log the failure; latestOffset escalates to a query error
            // once the failures are persistent — without that a typo'd
            // URL / DNS / TLS error retries forever while the stream
            // reads as merely idle
            logWarning(s"http-ndjson connect/read failed (will retry in " +
              s"$reconnectDelayMs ms): $e")
        }
        // stream ended or failed: the reference retries after a fixed pause
        if (!stopped) Thread.sleep(reconnectDelayMs)
      }
    }
  }
  reader.start()
  watchdog.foreach(_.start())

  private def offer(line: String): Unit = {
    lastEventAtMs = System.currentTimeMillis()
    lock.synchronized {
      buffer += ((line, System.currentTimeMillis() * 1000L))
    }
  }

  override def initialOffset(): Offset = HttpLineOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val n = json.toLong
    lock.synchronized {
      // checkpoint restart: a live tap cannot replay, so ADOPT the
      // committed offset as the numbering base for what the fresh buffer
      // holds — without the rebase, the restored start offset addresses a
      // window the new instance never buffered: planInputPartitions slices
      // empty, and commit() then silently discards the first post-restart
      // batch of real lines
      if (n > baseOffset + buffer.size) {
        baseOffset = n
        plannedEnd = math.max(plannedEnd, n)
      }
    }
    HttpLineOffset(n)
  }

  /** Connect failures in a row before the query is failed instead of
    * retrying silently (the reference's loop retries forever; a Spark query
    * should surface a dead endpoint to its monitoring). */
  private val maxConsecutiveFailures = 8

  override def latestOffset(): Offset = lock.synchronized {
    if (consecutiveFailures >= maxConsecutiveFailures)
      throw new IllegalStateException(
        s"http-ndjson: $consecutiveFailures consecutive connect failures to $url",
        lastError)
    val avail = baseOffset + buffer.size
    val window = math.max(plannedEnd, baseOffset) + maxLinesPerTrigger
    plannedEnd = math.max(plannedEnd, math.min(avail, if (window < 0) Long.MaxValue else window))
    HttpLineOffset(math.max(plannedEnd, baseOffset))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[HttpLineOffset].n, end.asInstanceOf[HttpLineOffset].n)
    val slice = lock.synchronized {
      if (e <= baseOffset) {
        // Checkpoint restart re-runs the last UNCOMMITTED batch, whose
        // window sits entirely below the rebased base (deserializeOffset
        // adopted the restored end as the numbering base for the fresh
        // buffer). A live tap cannot replay those lines — they died with
        // the previous process. Deliver the batch empty, loudly, so the
        // query commits past it and resumes on live data instead of
        // crash-looping on the require below.
        logWarning(s"http-ndjson: restart re-ran pre-restart window [$s,$e) " +
          s"below base $baseOffset on a non-replayable source — delivering " +
          "empty (those lines were lost with the previous process)")
        Array.empty[(String, Long)]
      } else {
        // fail LOUD on a PARTIALLY-overlapping window (start below the
        // trimmed base but end above it): that means commit() trimmed lines
        // a batch still addresses — a bookkeeping bug, not a restart; an
        // empty slice here would silently discard buffered lines
        require(s >= baseOffset,
          s"offset window [$s,$e) straddles trimmed base $baseOffset — non-replayable source")
        buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
      }
    }
    if (slice.isEmpty) return Array.empty
    val k = math.max(1, math.min(numPartitions, slice.length))
    slice.grouped((slice.length + k - 1) / k)
      .map(g => HttpLinesPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val rows = p.asInstanceOf[HttpLinesPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = new GenericInternalRow(
            Array[Any](UTF8String.fromString(rows(i)._1), rows(i)._2))
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = lock.synchronized {
    val n = end.asInstanceOf[HttpLineOffset].n
    val drop = (n - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = n }
  }

  override def stop(): Unit = {
    stopped = true
    val c = conn
    if (c != null) c.disconnect() // unblocks a blocked readLine
    reader.interrupt()
    watchdog.foreach(_.interrupt())
  }
}

/** A [start, end) slice of received lines, shipped to the executor. */
case class HttpLinesPartition(rows: Array[(String, Long)]) extends InputPartition
