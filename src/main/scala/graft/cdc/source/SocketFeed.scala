package graft.cdc.source

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Live-transport [[EventFeed]]: tails a line-delimited TCP stream (the
  * shape a replication relay/agent emits — one JSON event per line) and
  * spools it to local segment files; the feed VIEW delegates to
  * [[ReplayFeed]] over the spool. This is the same layering a MySQL
  * replica uses (network stream → relay log → consumers): the spool is
  * what makes `open(segment, from, to)` repeatable for crash replay,
  * which a raw socket cannot be.
  *
  * Demonstrates the A1 drop-in claim concretely: the DSv2 source's
  * offset/admission/partition machinery runs unchanged against a feed
  * whose events arrive over the network while the stream is live. On a
  * real cluster the spool directory must be shared storage (executors
  * read segments by path); in local mode any directory works.
  *
  * Spool segments rotate every `rotateEvery` events
  * (`spool-NNNNNN.jsonl`), mirroring binlog file rotation (A18) so the
  * (segment, index) offset space behaves like (file, position). */
final class SpoolingSocketFeed(host: String, port: Int, spoolDir: String,
    rotateEvery: Long = 100000L) extends EventFeed with AutoCloseable {

  private val replay = new ReplayFeed(spoolDir)
  Files.createDirectories(Paths.get(spoolDir))

  @volatile private var closed = false
  @volatile private var failure: Throwable = _

  private val tail = new Thread(() => {
    try {
      val socket = new Socket(host, port)
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      var segIdx = existingSegments
      var inSeg = 0L
      var line = in.readLine()
      while (line != null && !closed) {
        if (inSeg >= rotateEvery) { segIdx += 1; inSeg = 0L }
        Files.write(Paths.get(spoolDir, f"spool-$segIdx%06d.jsonl"),
          (line + "\n").getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        inSeg += 1
        line = in.readLine()
      }
      socket.close()
    } catch {
      case e: Throwable => if (!closed) failure = e
    }
  }, s"socket-feed-$host:$port")
  tail.setDaemon(true)
  tail.start()

  private def existingSegments: Int = replay.segments().size match {
    case 0 => 0
    case n => n - 1 // resume appending into the last segment
  }

  private def check(): Unit =
    if (failure != null) throw new RuntimeException(
      s"socket feed $host:$port failed", failure)

  override def segments(): Seq[String] = { check(); replay.segments() }
  override def extent(segment: String): Long = { check(); replay.extent(segment) }
  override def open(segment: String, from: Long, to: Long): FeedEventReader =
    replay.open(segment, from, to)

  override def close(): Unit = { closed = true; tail.interrupt() }
}
