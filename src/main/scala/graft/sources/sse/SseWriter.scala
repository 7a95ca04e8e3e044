package graft.sources.sse

import java.io.InputStream

/** Runnable writer process for the `graft-sse` source — the other half of
  * the reference's front door (`newSocket`, index.js:295-305): connect an
  * EventSource transport, run the [[SseClient]] protocol loop, and append
  * one JSONL line per message to the log that the DSv2 source tails. Spark
  * (the reader) and this writer share only the append-only log file, so
  * either side can restart independently; Spark's checkpoint supplies the
  * reader's recovery and `Last-Event-ID` supplies the writer's.
  *
  * Usage: `runMain graft.sources.sse.SseWriter <transport> <logPath>
  * [maxMessages] [maxConnects]` where `<transport>` is
  *  - `http(s)://…` — GET with `Accept: text/event-stream` and the
  *    `Last-Event-ID` header on reconnect (reference index.js:297-299:
  *    `headers: {'Last-Event-ID': JSON.stringify(lastEventId)}`). The
  *    production transport; this build environment has no egress, so it is
  *    exercised only up to connection setup in tests.
  *  - `file:<path>` — replay a captured `text/event-stream` file through
  *    the full protocol machinery (parser, dispatch, reconnect, watchdog).
  *  - `-` — read the event stream from stdin (pipe composition).
  */
object SseWriter {

  /** Build the `open` transport function for a spec string. Exposed for
    * tests (the writer main is just transport + [[SseClient.run]]).
    */
  def transportFor(spec: String): Option[String] => InputStream = spec match {
    case "-" =>
      _ => new java.io.BufferedInputStream(System.in)
    case s if s.startsWith("file:") =>
      _ => new java.io.FileInputStream(s.stripPrefix("file:"))
    case s if s.startsWith("http://") || s.startsWith("https://") =>
      lastId => {
        val conn = new java.net.URI(s).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestProperty("Accept", "text/event-stream")
        // Reconnect contract: resume after the last DISPATCHED event.
        lastId.foreach(id => conn.setRequestProperty("Last-Event-ID", id))
        conn.setConnectTimeout(30000)
        conn.setReadTimeout(0) // SSE is a long-lived stream; liveness is the watchdog's job
        val raw = conn.getInputStream
        // close() must actually SEVER the connection: the watchdog's
        // kill IS a close() from another thread, and a bare
        // HttpURLConnection stream close() first tries to DRAIN the
        // remaining body for keep-alive reuse — on a dead socket that
        // drain blocks on the same stall, and even when it returns it
        // does not reliably unblock a reader parked in read().
        // disconnect() is the documented abort and the only handle that
        // guarantees the reboot-after-watchdogMs contract on this
        // transport.
        new java.io.FilterInputStream(raw) {
          override def close(): Unit = {
            try conn.disconnect() catch { case _: Throwable => () }
            try super.close() catch { case _: Throwable => () }
          }
        }
      }
    case other =>
      throw new IllegalArgumentException(
        s"unknown transport '$other' (expected http(s)://…, file:<path>, or -)")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SseWriter <http(s)://…|file:path|-> <logPath> [maxMessages] [maxConnects]")
    val transport = args(0)
    val logPath = args(1)
    val maxMessages = if (args.length > 2) args(2).toLong else Long.MaxValue
    // Transport-aware reconnect default: the finite transports replay
    // from the START on every connection (file: re-opens the capture and
    // ignores Last-Event-ID; '-' re-wraps an exhausted stdin), so the
    // unbounded HTTP default would append the whole capture as
    // duplicates forever (file:) or spin on empty reconnects without
    // ever exiting ('-'). One pass is the meaningful default there; an
    // explicit 4th arg still overrides.
    val maxConnects =
      if (args.length > 3) args(3).toInt
      else if (transport == "-" || transport.startsWith("file:")) 1
      else Int.MaxValue
    val client = new SseClient(transportFor(transport), logPath)
    val written = client.run(maxMessages, maxConnects)
    System.err.println(s"[sse-writer] appended $written messages to $logPath")
  }
}
