package graft.cdc.source

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Live-transport [[EventFeed]]: tails a line-delimited TCP stream (the
  * shape a replication relay/agent emits — one JSON event per line) and
  * spools it to local segment files; the feed VIEW delegates to
  * [[ReplayFeed]] over the spool. This is the same layering a MySQL
  * replica uses (network stream → relay log → consumers): the spool is
  * what makes `open(segment, from, to)` repeatable for crash replay,
  * which a raw socket cannot be.
  *
  * Durability/visibility contract:
  *  - the spool DIRECTORY is dedicated: it may contain only
  *    `spool-NNNNNN.jsonl` segments (enforced at construction) so the
  *    (segment, index) offset order is exactly append order;
  *  - each event is appended as ONE `FileChannel.write` of the full
  *    `line\n` buffer on an APPEND-mode channel, so concurrent
  *    `extent()` polls never observe a torn line (single-write appends
  *    of small buffers are atomic on local filesystems);
  *  - a partial line received before a disconnect is DISCARDED, never
  *    spooled — only newline-terminated events are durable;
  *  - the tail reconnects forever with backoff (tail -F semantics —
  *    transient relay outages or clean server EOFs never kill the
  *    feed); each (re)connect starts a FRESH segment, so a segment is
  *    append-closed once a later segment exists. `close()` closes the
  *    live socket, which unblocks and stops the tail thread.
  *
  * Demonstrates the A1 drop-in claim concretely: the DSv2 source's
  * offset/admission/partition machinery runs unchanged against a feed
  * whose events arrive over the network while the stream is live. On a
  * real cluster the spool directory must be shared storage (executors
  * read segments by path); in local mode any directory works.
  */
final class SpoolingSocketFeed(host: String, port: Int, spoolDir: String,
    rotateEvery: Long = 100000L) extends EventFeed with AutoCloseable {

  private val replay = new ReplayFeed(spoolDir)
  Files.createDirectories(Paths.get(spoolDir))
  // dedicated-dir contract: mixed content would interleave foreign
  // segments into the offset order and silently strand appends
  locally {
    val st = Files.list(Paths.get(spoolDir))
    val foreign =
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".jsonl") && !n.matches("spool-[0-9]{6}\\.jsonl"))
        .toSeq
      finally st.close()
    require(foreign.isEmpty,
      s"spool dir $spoolDir must contain only spool-NNNNNN.jsonl segments, found: $foreign")
  }

  @volatile private var closed = false
  @volatile private var liveSocket: Socket = _

  /** Highest existing spool index + 1 — every (re)connect starts a
    * fresh segment so closed segments never grow again. */
  private def nextSegIdx(): Int =
    replay.segments().map(_.stripPrefix("spool-").stripSuffix(".jsonl").toInt)
      .maxOption.map(_ + 1).getOrElse(0)

  private val tail = new Thread(() => {
    var backoffMs = 50L
    while (!closed) {
      var channel: FileChannel = null
      try {
        val socket = new Socket(host, port)
        liveSocket = socket
        backoffMs = 50L
        val in = new BufferedReader(
          new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
        var segIdx = nextSegIdx()
        var inSeg = 0L
        def openSeg(): FileChannel = FileChannel.open(
          Paths.get(spoolDir, f"spool-$segIdx%06d.jsonl"),
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        channel = openSeg()
        // manual line assembly: only newline-TERMINATED events are
        // spooled (readLine would surface a torn final line as complete)
        val buf = new java.lang.StringBuilder
        var c = in.read()
        while (c != -1 && !closed) {
          if (c == '\n') {
            if (buf.length > 0) {
              if (inSeg >= rotateEvery) {
                channel.close(); segIdx += 1; inSeg = 0L; channel = openSeg()
              }
              channel.write(ByteBuffer.wrap(
                (buf.toString + "\n").getBytes(StandardCharsets.UTF_8)))
              inSeg += 1
              buf.setLength(0)
            }
          } else if (c != '\r') buf.append(c.toChar)
          c = in.read()
        }
        socket.close() // clean EOF (or close()) — partial buf discarded
      } catch {
        case _: Throwable if closed => () // close() raced the socket
        case e: Throwable =>
          System.err.println(
            s"[socket-feed] $host:$port: ${e.getMessage}; retrying in ${backoffMs}ms")
      } finally if (channel != null) channel.close()
      if (!closed) {
        try Thread.sleep(backoffMs) catch { case _: InterruptedException => () }
        backoffMs = math.min(backoffMs * 2, 5000L)
      }
    }
  }, s"socket-feed-$host:$port")
  tail.setDaemon(true)
  tail.start()

  override def segments(): Seq[String] = replay.segments()
  override def extent(segment: String): Long = replay.extent(segment)
  override def open(segment: String, from: Long, to: Long): FeedEventReader =
    replay.open(segment, from, to)

  override def close(): Unit = {
    closed = true
    // Socket reads ignore Thread.interrupt — closing the socket is what
    // actually unblocks the tail thread
    val s = liveSocket
    if (s != null) try s.close() catch { case _: Throwable => () }
    tail.interrupt()
  }
}
