package graft.zulip

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

/** The reference's Zulip-side connection watchdog (status.rs:47-66 +
  * periodically_ensure_alive_connection, status.rs:72-88): every `checkMs`
  * (reference: 15 s), if no message/heartbeat ping has arrived for
  * `silenceRestartMs` (reference: 300 s), the RTM connection is restarted —
  * a fresh register (new queue id) and a fresh poll loop. This is the Zulip
  * twin of the `http-ndjson` source's event-silence supervisor
  * (status.rs:36-45's 90 s stream watchdog).
  *
  * Two deliberate hardenings over the reference: the stale loop is STOPPED
  * before the replacement starts (the reference spawns a second connection
  * and leaks the first), and a loop thread that died outright (register
  * threw, unhandled error) is restarted at the next check rather than
  * waiting out the full silence window.
  */
final class ZulipSupervisor(
    conf: ZulipConf,
    client: ZulipClient,
    handler: String => Option[String],
    onPing: () => Unit = () => (),
    silenceRestartMs: Long = 300000L,
    checkMs: Long = 15000L) {

  @volatile private var lastPingMs = 0L
  @volatile private var loopStop: AtomicBoolean = _
  @volatile private var loopThread: Thread = _
  private val restarts = new AtomicInteger(0)

  /** Number of times the watchdog restarted the connection. */
  def restartCount: Int = restarts.get()

  private def startRtm(): Unit = {
    lastPingMs = System.currentTimeMillis()
    loopStop = new AtomicBoolean(false)
    val rtm = new ZulipRtm(conf, client, handler,
      onPing = () => { lastPingMs = System.currentTimeMillis(); onPing() })
    val stop = loopStop
    loopThread = new Thread(() => {
      try rtm.run(stop)
      catch {
        case e: Exception =>
          System.err.println(s"zulip rtm loop died: ${e.getMessage}")
      }
    }, "zulip-rtm")
    loopThread.setDaemon(true)
    loopThread.start()
  }

  /** Sleep `ms` in short slices, returning early the moment `stop` flips —
    * a monolithic `Thread.sleep(checkMs)` makes shutdown latency equal the
    * watchdog cadence (60 s configs blew straight through the caller's
    * join timeout and left a "live writer" verdict on a healthy exit). */
  private def sleepUnless(stop: AtomicBoolean, ms: Long): Unit = {
    val end = System.currentTimeMillis() + ms
    var left = ms
    while (!stop.get() && left > 0) {
      Thread.sleep(math.min(200L, left))
      left = end - System.currentTimeMillis()
    }
  }

  /** Run the supervised connection until `stop`; blocking (the watchdog IS
    * this loop — use [[start]] for the daemon-thread form). */
  def run(stop: AtomicBoolean): Unit = {
    startRtm()
    while (!stop.get()) {
      sleepUnless(stop, checkMs)
      if (!stop.get()) {
        val silent = System.currentTimeMillis() - lastPingMs > silenceRestartMs
        if (silent || !loopThread.isAlive) {
          loopStop.set(true)
          startRtm()
          restarts.incrementAndGet()
          System.err.println("Zulip connection restarted.")
        }
      }
    }
    loopStop.set(true)
  }

  def start(stop: AtomicBoolean): Thread = {
    val t = new Thread(() => run(stop), "zulip-supervisor")
    t.setDaemon(true)
    t.start()
    t
  }
}
