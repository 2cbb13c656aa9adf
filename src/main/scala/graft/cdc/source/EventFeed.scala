package graft.cdc.source

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** One decoded replication event, engine-agnostic (no Spark types) —
  * the shape the reference's reader hands its pool
  * (/root/reference/internal/binwatch/blreaderwork/blreaderwork.go:119-140:
  * event type, binlog file/position, schema/table, column names, rows). */
final case class FeedEvent(
    eventType: String,
    binlogFile: String,
    binlogPosition: Long,
    database: String,
    table: String,
    colNames: Array[String],
    rows: Array[Array[String]])

/** Pull-based reader over one segment slice; caller closes. */
trait FeedEventReader extends AutoCloseable {
  def next(): Boolean
  def get(): FeedEvent
}

/** The replication-client seam (A1): a totally-ordered, resumable feed of
  * binlog events, addressed by (segment, index) — the typed interface
  * between the DSv2 offset/partition machinery and the byte-level source.
  *
  * A live MySQL replication client (blreaderwork.go:51-61: registers as a
  * replica, tails ROW-format events) implements this by mapping segments
  * to binlog file names and extents to event counts past the registered
  * position; the replay twin below maps them to .jsonl fixture files and
  * line numbers. The DSv2 layer ([[BinlogReplayStream]]) only ever talks
  * to this trait, so swapping in a live client touches no offset,
  * admission-control, checkpoint, or partition-planning code.
  *
  * Contract: `segments` is totally ordered and append-only; `extent` is
  * monotonically non-decreasing per segment; `open(seg, from, to)` must
  * be repeatable (at-least-once replay after crash) — which for a live
  * client means a server-side re-seek to (segment, from). */
trait EventFeed {
  /** Ordered segment names (binlog files, oldest first). */
  def segments(): Seq[String]
  /** Events currently available in a segment (exclusive upper bound). */
  def extent(segment: String): Long
  /** Typed events [from, to) of one segment. */
  def open(segment: String, from: Long, to: Long): FeedEventReader
  /** Replication-source hints (source.flavor mysql|mariadb and a
    * GTID-style start position — config.go:104-122). A live protocol
    * client uses these to pick the dialect it speaks and the register
    * position; the file feeds (replay / spool / binary) have no server to
    * negotiate with, so the default is a DOCUMENTED NO-OP — segments are
    * already materialized and addressed by (segment, index). */
  def configure(flavor: String, startGtid: Option[String]): Unit = ()
}

/** Replay implementation: a directory of JSONL files (one per binlog
  * file, one event per line), segment = file name, extent = line count. */
final class ReplayFeed(path: String) extends EventFeed {

  private def dirFiles: Seq[Path] = {
    val dir = Paths.get(path)
    if (!Files.isDirectory(dir)) return Seq.empty
    val st = Files.list(dir)
    try st.iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.endsWith(".jsonl"))
      .sortBy(_.getFileName.toString)
    finally st.close()
  }

  override def segments(): Seq[String] = dirFiles.map(_.getFileName.toString)

  override def extent(segment: String): Long = {
    val p = Paths.get(path).resolve(segment)
    if (!Files.exists(p)) 0L
    else {
      val s = Files.lines(p, StandardCharsets.UTF_8)
      try s.count() finally s.close()
    }
  }

  override def open(segment: String, from: Long, to: Long): FeedEventReader =
    new FeedEventReader {
      private val mapper = new ObjectMapper()
      private val lines = Files.lines(Paths.get(path).resolve(segment), StandardCharsets.UTF_8)
      private val it = lines.iterator().asScala.zipWithIndex
        .filter { case (_, i) => i >= from && i < to }
        .map(_._1).filter(_.nonEmpty)
      private var current: FeedEvent = _

      override def next(): Boolean =
        if (it.hasNext) { current = parse(it.next()); true } else false
      override def get(): FeedEvent = current
      override def close(): Unit = lines.close()

      private def str(n: JsonNode, field: String): String =
        if (n.hasNonNull(field)) n.get(field).asText() else null

      private def parse(line: String): FeedEvent = {
        val n = mapper.readTree(line)
        val colNames =
          if (n.hasNonNull("colNames"))
            n.get("colNames").elements().asScala.map(_.asText()).toArray
          else null
        val rows =
          if (n.hasNonNull("rows"))
            n.get("rows").elements().asScala.map(row =>
              row.elements().asScala
                .map(e => if (e.isNull) null else e.asText()).toArray).toArray
          else null
        FeedEvent(str(n, "eventType"), str(n, "binlogFile"),
          if (n.hasNonNull("binlogPosition")) n.get("binlogPosition").asLong() else 0L,
          str(n, "database"), str(n, "table"), colNames, rows)
      }
    }
}
