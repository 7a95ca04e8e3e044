package graft.sources.sse

import java.io.{BufferedReader, InputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** SSE wire-protocol client — the reference's front door (`newSocket`,
  * index.js:295-305) split into its two halves:
  *
  *  - THIS class: the EventSource protocol machinery. Parses the
  *    `text/event-stream` framing (`data:`/`event:`/`id:` fields,
  *    multi-line data, `:` comments, blank-line dispatch), appends each
  *    complete message as ONE JSONL line to the log that the `graft-sse`
  *    DSv2 source tails, reconnects on EOF/error with backoff carrying the
  *    `Last-Event-ID` contract (index.js:299: `headers: {'Last-Event-ID':
  *    ...}`), and reboots a stalled connection after `watchdogMs` with no
  *    traffic (the reference's 5-minute watchdog, index.js:348-356).
  *
  *  - The TRANSPORT: an injected `open: lastEventId => InputStream`. In
  *    production that is an HTTP GET of
  *    stream.wikimedia.org/v2/stream/recentchange with the Last-Event-ID
  *    header; this environment has zero egress, so tests inject file / pipe
  *    / byte streams. Every protocol behavior is real and spec-tested.
  *
  * Threading: `run()` blocks the calling thread (the writer process's main
  * loop); the watchdog is a daemon thread that closes the current stream,
  * which surfaces in `run()` as an IOException → reconnect.
  *
  * Framing note: each dispatched message is written as one `\n`-terminated
  * line (multi-line `data:` fields are joined with a space, not `\n` — the
  * recentchange payload is single-line JSON, and the log's offset unit is
  * the line).
  */
final class SseClient(
    open: Option[String] => InputStream,
    logPath: String,
    watchdogMs: Long = 5 * 60 * 1000L,
    reconnectBackoffMs: Long = 100L) {

  @volatile private var lastEventId: Option[String] = None
  @volatile private var lastTrafficMs: Long = System.currentTimeMillis()
  @volatile private var current: InputStream = _
  @volatile private var stopped = false
  // Server-directed reconnection delay (the WHATWG `retry:` field) —
  // defaults to the constructor backoff until the server sets one.
  @volatile private var retryDelayMs: Long = reconnectBackoffMs
  // Run generation: each run() claims a new generation so an EXITING
  // watchdog from a previous run can never sever a restarted run's
  // fresh stream (see startWatchdog's exit path).
  private val runGen = new java.util.concurrent.atomic.AtomicLong(0L)

  def currentLastEventId: Option[String] = lastEventId

  /** Test seam: the effective (capped) reconnection delay. */
  private[graft] def currentRetryDelayMs: Long = retryDelayMs

  /** Consume the feed until `maxMessages` have been appended or the
    * transport has been (re)opened `maxConnects` times. Returns the number
    * of messages appended.
    */
  def run(maxMessages: Long = Long.MaxValue, maxConnects: Int = Int.MaxValue): Long = {
    stopped = false // run() is restartable: a supervisor may retry after maxConnects
    var written = 0L
    var connects = 0
    val watchdog = startWatchdog(runGen.incrementAndGet())
    try {
      while (!stopped && written < maxMessages && connects < maxConnects) {
        connects += 1
        // Per-connection progress lives in an accumulator consume()
        // updates AS it appends, not in its return value: a connection
        // severed mid-read (watchdog kill, transport IOException) throws
        // out of consume(), and a return-value count would lose every
        // message that connection already appended — run() would then
        // over-append past maxMessages on the resumed connection and
        // under-report the total.
        val counted = new java.util.concurrent.atomic.AtomicLong(0L)
        try {
          val in = openWithDeadline(lastEventId)
          // Traffic freshness BEFORE current: the watchdog must never
          // see the new stream paired with the previous connection's
          // stale timestamp.
          lastTrafficMs = System.currentTimeMillis()
          current = in
          // stop() racing the connect: it closed the PREVIOUS stream (or
          // none) before `current` was assigned, and the watchdog exits
          // on stopped=true without closing anything — on a quiet feed
          // nothing would ever sever this fresh stream and run() would
          // block in readLine forever. Re-check under the new stream.
          if (stopped) { closeQuietly(); throw new java.io.IOException("stopped") }
          consume(in, maxMessages - written, counted)
        } catch {
          case e: java.io.IOException =>
            // Severed connections (EOF-mid-event, watchdog kill, stop())
            // are the normal reconnect path — but a PERMANENT local
            // failure (unwritable log, missing file: capture, DNS) used
            // to spin through every reconnect with zero diagnostics
            // anywhere. One stderr line per failed connection keeps the
            // root cause visible without flooding a healthy feed (a
            // clean EOF raises no exception and stays silent).
            if (!stopped)
              System.err.println(
                s"[sse-client] connection ${connects} ended: $e")
        } finally {
          written += counted.get()
          closeQuietly()
        }
        if (!stopped && written < maxMessages && connects < maxConnects)
          sleepUnlessStopped(retryDelayMs)
      }
      written
    } finally {
      stopped = true
      watchdog.interrupt()
      closeLog()
    }
  }

  def stop(): Unit = { stopped = true; closeQuietly() }

  /** Reconnect-backoff sleep in short slices re-checking `stopped`: a
    * plain `Thread.sleep(retryDelayMs)` is uninterruptible by stop()
    * (which only sets the flag and closes streams — there is no stream
    * to sever between connections), so one server-directed long `retry:`
    * would park the client for its full duration after stop().
    */
  private def sleepUnlessStopped(ms: Long): Unit = {
    // Monotonic clock: an NTP step during a minutes-long backoff would
    // stretch (backward step) or truncate (forward) a wall-clock
    // deadline — elapsed-time logic takes nanoTime.
    val deadline = System.nanoTime() + ms * 1000000L
    var remainingMs = ms
    while (!stopped && remainingMs > 0L) {
      Thread.sleep(math.min(remainingMs, 100L))
      remainingMs = (deadline - System.nanoTime()) / 1000000L
    }
  }

  /** One connection's lifetime: parse events until EOF or the message
    * budget is exhausted; every append is counted through `counted`
    * immediately (see run() for why the count must survive a severed
    * connection).
    */
  private def consume(in: InputStream, budget: Long,
      counted: java.util.concurrent.atomic.AtomicLong): Unit = {
    val reader = new BufferedReader(
      new InputStreamReader(in, StandardCharsets.UTF_8))
    val dataLines = scala.collection.mutable.ArrayBuffer.empty[String]
    var eventType = "message"
    // Per the SSE spec the `id:` field sets a BUFFER that is committed to
    // the reconnect Last-Event-ID only when its event is dispatched (for
    // ANY event type). Committing at parse time would, on a connection
    // severed between the id line and the blank-line dispatch, resume
    // AFTER the never-appended event and silently drop it.
    var pendingId: Option[String] = None
    var line = reader.readLine()
    // WHATWG: one leading U+FEFF on the stream is ignored — a replayed
    // capture saved by a BOM-writing editor must not misparse its first
    // field name (and thereby drop the first event on every reconnect).
    if (line != null && line.nonEmpty && line.charAt(0) == '\uFEFF')
      line = line.substring(1)
    while (line != null && counted.get() < budget) {
      lastTrafficMs = System.currentTimeMillis()
      line match {
        case "" => // blank line: dispatch the accumulated event
          // An EMPTY event-type buffer dispatches as 'message' per WHATWG
          // (`event:` with no value resets to the default, it does not
          // name an unknown type that would suppress the append).
          if (dataLines.nonEmpty &&
              (eventType.isEmpty || eventType == "message")) {
            append(dataLines.mkString(" "))
            counted.incrementAndGet()
          }
          // Per WHATWG the last-event-ID commits at EVERY dispatch, even
          // when the data buffer is empty (the empty-data early return in
          // the spec's dispatch steps comes AFTER the id commit) — servers
          // send id-only keepalives (`id: 42\n\n`) precisely to advance
          // the reconnect cursor. It commits AFTER the append, though: a
          // failed log write (disk full) must leave the cursor on the
          // previous event so the reconnect replays this one instead of
          // silently resuming past the never-appended message.
          pendingId.foreach(id => lastEventId = Some(id))
          pendingId = None
          dataLines.clear()
          eventType = "message"
        case l if l.startsWith(":") => // comment / keep-alive ping
        case l =>
          val (field, value) = l.indexOf(':') match {
            case -1 => (l, "")
            case i =>
              val v = l.substring(i + 1)
              (l.substring(0, i), if (v.startsWith(" ")) v.substring(1) else v)
          }
          field match {
            case "data"  => dataLines += value
            case "event" => eventType = value
            case "id"    => pendingId = Some(value)
            case "retry" =>
              // WHATWG-defined field (NOT unknown): an all-ASCII-digit
              // value sets the reconnection delay; anything else is
              // ignored. Without this a maintenance drop after
              // `retry: 30000` would be hammered at the 100 ms default.
              // CAPPED: the spec puts no bound on the value, but one
              // adversarial/buggy `retry: 999999999999` feed line is the
              // same single-row threat model as the cmd-forgery gate —
              // honoring it verbatim parks the client effectively
              // forever. 5 minutes matches the watchdog's order of
              // magnitude; a real maintenance window longer than that
              // just costs periodic cheap reconnect attempts.
              if (value.nonEmpty && value.length <= 15 &&
                  value.forall(c => c >= '0' && c <= '9'))
                retryDelayMs = math.min(value.toLong, SseClient.MaxRetryDelayMs)
            case _       => // unknown field: ignored per the SSE spec
          }
      }
      line = if (counted.get() < budget) reader.readLine() else null
    }
    // EOF without a trailing blank line: per spec the incomplete event is
    // NOT dispatched (it will be re-sent after reconnect via Last-Event-ID).
  }

  /** Connect with the watchdog budget enforced on the connect phase
    * itself: the watchdog thread can only close an EXISTING stream, so a
    * transport whose open() blackholes (hung TCP/TLS handshake with no
    * connect timeout) would otherwise stall `run()` forever with nothing
    * to kill — violating the "reboot after watchdogMs" contract. The
    * connect runs on a disposable daemon thread; on timeout the attempt
    * is abandoned (a late-arriving stream closes itself via the abandoned
    * flag — a benign race can leak one stream per hung connect, bounded
    * by the reconnect cadence) and run() retries with backoff.
    */
  private def openWithDeadline(id: Option[String]): InputStream = {
    val abandoned = new java.util.concurrent.atomic.AtomicBoolean(false)
    val task = new java.util.concurrent.FutureTask[InputStream](() => {
      val s = open(id)
      if (abandoned.get()) {
        try s.close() catch { case _: Throwable => () }
        throw new java.io.IOException("connect abandoned after deadline")
      }
      s
    })
    val t = new Thread(task, "graft-sse-connect")
    t.setDaemon(true)
    t.start()
    try task.get(watchdogMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        abandoned.set(true)
        task.cancel(true)
        throw new java.io.IOException(
          s"connect stalled past watchdog ($watchdogMs ms)")
      case e: java.util.concurrent.ExecutionException =>
        e.getCause match {
          case io: java.io.IOException => throw io
          case other                   => throw other
        }
    }
  }

  // The log stream opens ONCE (lazily) and lives for run()'s lifetime:
  // an open/append/close per message triples the hot-path syscalls on a
  // live feed. Only run()'s thread touches it; run()'s finally closes it
  // (not stop(), which runs on another thread mid-write).
  private var log: java.io.OutputStream = _
  // Log length known to end on a committed '\n': observed at open, then
  // advanced by every fully-successful line write. The torn-write
  // truncation below rewinds to this boundary.
  private var goodLen: Long = 0L

  private def append(payload: String): Unit = {
    // Whole-line append + flush per message: the tail counter and the
    // partition reader both treat the line as the atomic unit (one
    // write syscall per line, same atomicity as the old per-message
    // open/append/close).
    if (log == null) {
      val f = new java.io.File(logPath)
      // The pre-existing tail is NOT assumed committed: a previous
      // process killed mid-write (ENOSPC, SIGKILL) leaves a torn line no
      // in-run truncation ever covered — the first replayed event would
      // concatenate onto it, and the '\n'-counting tail counter would
      // happily serve the merged corrupt line. Scan back to the last
      // committed '\n' and truncate BEFORE the first append, exactly the
      // in-run torn-write recovery applied at open.
      goodLen = if (f.exists()) lastLineBoundary(f) else 0L
      if (f.exists() && f.length() > goodLen) {
        val raf = new java.io.RandomAccessFile(logPath, "rw")
        try raf.setLength(goodLen) finally raf.close()
      }
      log = Files.newOutputStream(Paths.get(logPath),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
    val bytes = (payload + "\n").getBytes(StandardCharsets.UTF_8)
    try {
      log.write(bytes)
      log.flush()
      goodLen += bytes.length
    } catch {
      case t: Throwable =>
        // A failed write (ENOSPC mid-payload) can land a PREFIX of the
        // line with no '\n': the tail counter rightly ignores the torn
        // bytes, but the event replays after reconnect (pendingId is
        // uncommitted) and a bare re-append would CONCATENATE the full
        // payload onto the torn prefix — one corrupt merged line, the
        // message silently lost. Truncate back to the last known-good
        // boundary so the replay lands on a clean line; best-effort
        // (the original error propagates either way, and an untruncated
        // log just re-surfaces here on the next append attempt).
        try {
          closeLog()
          val raf = new java.io.RandomAccessFile(logPath, "rw")
          try raf.setLength(goodLen) finally raf.close()
        } catch { case _: Throwable => () }
        throw t
    }
  }

  /** Length of the longest prefix ending on a committed '\n' (0 when the
    * file holds none) — backward chunked scan, so a long healthy log
    * costs one 8 KiB read from the end.
    */
  private def lastLineBoundary(f: java.io.File): Long = {
    val raf = new java.io.RandomAccessFile(f, "r")
    try {
      var pos = raf.length()
      val buf = new Array[Byte](8192)
      while (pos > 0L) {
        val start = math.max(0L, pos - buf.length)
        val len = (pos - start).toInt
        raf.seek(start)
        raf.readFully(buf, 0, len)
        var i = len - 1
        while (i >= 0) {
          if (buf(i) == '\n') return start + i + 1
          i -= 1
        }
        pos = start
      }
      0L
    } finally raf.close()
  }

  private def closeLog(): Unit = {
    val l = log
    log = null
    if (l != null) try l.close() catch { case _: Throwable => () }
  }

  /** Reference watchdog (index.js:348-356): "if no message received for
    * 5 minutes, assume the socket died and reboot it". Closing the stream
    * forces the blocking read to fail, and `run()` reconnects.
    *
    * The victim is SNAPSHOTTED before the staleness check: deciding on a
    * stale `lastTrafficMs` and then closing whatever `current` points at
    * would kill a connection run() established in between (re-closing the
    * snapshotted previous stream is harmless — it is already closed).
    */
  private def startWatchdog(gen: Long): Thread = {
    val t = new Thread(() => {
      try {
        while (!stopped) {
          Thread.sleep(math.max(watchdogMs / 4, 1L))
          val victim = current
          if (!stopped && victim != null &&
              System.currentTimeMillis() - lastTrafficMs > watchdogMs)
            closeStream(victim)
        }
        // Exiting on stopped: sever whatever stream is current so a
        // connect that raced stop() can't leave run() blocked in
        // readLine (second line of defense behind run()'s own re-check).
        // GENERATION-guarded: a supervisor may have already restarted
        // run() (which resets stopped and claims a new generation) — an
        // exiting watchdog from the PREVIOUS run must not sever the new
        // run's healthy stream. If the generation moved on, the new
        // run's own watchdog owns the backstop.
        if (runGen.get() == gen) closeQuietly()
      } catch { case _: InterruptedException => () }
    }, "graft-sse-watchdog")
    t.setDaemon(true)
    t.start()
    t
  }

  private def closeQuietly(): Unit = closeStream(current)

  private def closeStream(in: InputStream): Unit =
    if (in != null) try in.close() catch { case _: Throwable => () }
}

object SseClient {
  /** Ceiling on the server-directed `retry:` reconnection delay. */
  val MaxRetryDelayMs: Long = 5 * 60 * 1000L
}
