package graft.cdc.source

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.cdc.Model

/** DSv2 replay twin of the binlog streaming source (SURVEY.md A1/M2).
  *
  * The live reference source is a MySQL replication-protocol tail
  * (/root/reference/internal/binwatch/blreaderwork/blreaderwork.go:51-61,
  * 119,140); its essential contract is (a) a totally-ordered stream of
  * events addressed by (binlogFile, binlogPosition), (b) resumable from a
  * checkpointed position, (c) bounded per-pull reads (the reference's
  * 20-slot pool ≙ maxEventsPerTrigger). All offset, admission-control,
  * checkpoint, and partition-planning machinery here talks only to the
  * typed [[EventFeed]] seam; [[ReplayFeed]] (JSONL fixture directory) is
  * the shipped implementation, and a live replication client is a
  * drop-in second implementation of the same trait.
  *
  * Offsets are (fileIdx, line) — the replay analog of (file, position).
  * `startingFile`/`startingLine` options mirror the reference's
  * startLocation precedence (blreaderwork.go:78-109): honored when no
  * checkpoint exists (Spark rule; delete the checkpoint to force).
  *
  * usage: spark.readStream.format("binlog-replay").option("path", dir)
  *          .option("maxEventsPerTrigger", "500").load()
  */
class BinlogReplayProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "binlog-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Model.RawEventSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new BinlogReplayTable(properties.get("path"), properties)
}

class BinlogReplayTable(path: String, props: JMap[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"binlog-replay($path)"
  override def schema(): StructType = Model.RawEventSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new BinlogReplayScan(path, options)
}

case class BinlogReplayOffset(fileIdx: Int, line: Long) extends Offset {
  override def json(): String = s"""{"fileIdx":$fileIdx,"line":$line}"""
}

object BinlogReplayOffset {
  private val mapper = new ObjectMapper()
  def fromJson(s: String): BinlogReplayOffset = {
    val n = mapper.readTree(s)
    BinlogReplayOffset(n.get("fileIdx").asInt(), n.get("line").asLong())
  }
}

class BinlogReplayScan(path: String, options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = Model.RawEventSchema
  override def description(): String = s"binlog-replay scan of $path"

  private val format = BinlogFeeds.formatOf(options)

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      BinlogFeeds.forOptions(path, options).segments().map { seg =>
        FeedSlicePartition(path, seg, 0L, Long.MaxValue, format)
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory = new ReplayReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BinlogReplayStream(path, options)
}

class BinlogReplayStream(path: String, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val maxEvents: Long =
    Option(options.get("maxEventsPerTrigger")).map(_.toLong).getOrElse(Long.MaxValue)

  /** The replication-client seam — every segment/extent decision below
    * goes through this trait, never the filesystem directly. With
    * `option("socket", "host:port")` the feed is a live
    * [[SpoolingSocketFeed]] tailing a network stream into the spool at
    * `path`; otherwise the plain replay feed over existing files. */
  private val feed: EventFeed = BinlogFeeds.forOptions(path, options)
  private val format = BinlogFeeds.formatOf(options)

  private def segs: Seq[String] = feed.segments()

  // Trigger.AvailableNow: freeze the end of the stream at prepare time so
  // the bounded micro-batches drain up to exactly this point, then stop.
  @volatile private var availableNowCap: Option[BinlogReplayOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(latestOffset().asInstanceOf[BinlogReplayOffset])

  override def initialOffset(): Offset = {
    val startFile = Option(options.get("startingFile"))
    val startLine = Option(options.get("startingLine")).map(_.toLong).getOrElse(0L)
    startFile match {
      case Some(f) =>
        val idx = segs.indexWhere(_.startsWith(f))
        BinlogReplayOffset(math.max(idx, 0), startLine)
      case None => BinlogReplayOffset(0, 0L)
    }
  }

  override def latestOffset(): Offset = {
    val fs = segs
    if (fs.isEmpty) BinlogReplayOffset(0, 0L)
    else BinlogReplayOffset(fs.size - 1, feed.extent(fs.last))
  }

  /** Bounded admission — the replay analog of the reference's bounded
    * pool backpressure (pools.go:39-82). Walks forward from `start`,
    * admitting at most the row limit, never past the AvailableNow cap. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BinlogReplayOffset]
    val fs = segs
    if (fs.isEmpty) return s
    val cap = availableNowCap.getOrElse(
      BinlogReplayOffset(fs.size - 1, feed.extent(fs.last)))
    var remaining = limit match {
      case r: ReadMaxRows => r.maxRows()
      case _ => maxEvents
    }
    var fi = s.fileIdx
    var line = s.line
    while (remaining > 0 && (fi < cap.fileIdx || (fi == cap.fileIdx && line < cap.line))) {
      val total = if (fi == cap.fileIdx) cap.line else feed.extent(fs(fi))
      val avail = total - line
      if (avail <= 0) { fi += 1; line = 0L }
      else {
        val take = math.min(remaining, avail)
        line += take
        remaining -= take
        if (line >= total && fi < cap.fileIdx) { fi += 1; line = 0L }
      }
    }
    BinlogReplayOffset(fi, line)
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxEvents == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxEvents)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BinlogReplayOffset]
    val e = end.asInstanceOf[BinlogReplayOffset]
    val fs = segs
    (s.fileIdx to math.min(e.fileIdx, fs.size - 1)).flatMap { fi =>
      val from = if (fi == s.fileIdx) s.line else 0L
      val to = if (fi == e.fileIdx) e.line else Long.MaxValue
      if (to > from) Some(FeedSlicePartition(path, fs(fi), from, to, format)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new ReplayReaderFactory
  override def deserializeOffset(json: String): Offset = BinlogReplayOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Driver-side feed registry: the live socket feed is a per-(endpoint,
  * spool) singleton so repeated stream (re)starts share one tail thread
  * and keep appending to the same spool — executors always read the
  * spool via [[ReplayFeed]], so partitions need no network access. */
object BinlogFeeds {
  private val socketFeeds =
    new java.util.concurrent.ConcurrentHashMap[(String, String), SpoolingSocketFeed]()
  private val replicationFeeds =
    new java.util.concurrent.ConcurrentHashMap[(String, String), ReplicationFeed]()

  /** Segment encoding: "jsonl" (replay/spool fixtures), "binlog" (real
    * binary files via [[BinlogFileFeed]]), or "replication" (live MySQL
    * wire protocol via [[ReplicationFeed]], spooling binary relay
    * segments under `path`). */
  def formatOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("format")).getOrElse("jsonl")

  def forOptions(path: String, options: CaseInsensitiveStringMap): EventFeed = {
    val feed = buildFeed(path, options)
    // thread the replication-dialect hints through the seam (no-op for
    // file feeds, dialect/registration/start input for the live client)
    feed.configure(Option(options.get("flavor")).getOrElse("mysql"),
      Option(options.get("startingGtid")))
    feed
  }

  private def buildFeed(path: String, options: CaseInsensitiveStringMap): EventFeed =
    if (formatOf(options) == "binlog") new BinlogFileFeed(path)
    else if (formatOf(options) == "replication") {
      val host = Option(options.get("host")).getOrElse(
        sys.error("replication format requires a 'host' option"))
      val port = Option(options.get("port")).map(_.toInt).getOrElse(3306)
      val user = Option(options.get("user")).getOrElse("root")
      val password = Option(options.get("password")).getOrElse("")
      val slaveServerId = Option(options.get("slaveServerId")).map(_.toLong).getOrElse(1001L)
      val tlsMode = Option(options.get("tlsMode")).getOrElse("disabled")
      val tlsCa = Option(options.get("tlsCa"))
      val readTimeoutMs = Option(options.get("readTimeoutMs")).map(_.toLong).getOrElse(90000L)
      val heartbeatMs = Option(options.get("heartbeatPeriodMs")).map(_.toLong).getOrElse(60000L)
      // raw-option default TRUE = go-mysql's own retry posture (the
      // library feed reconnects with backoff); the CONFIG layer
      // always passes the reference default (false) explicitly
      val restartOnError = Option(options.get("restartOnError")).forall(_.toBoolean)
      val wanted = ReplicationFeed.fingerprint(user, password, slaveServerId,
        tlsMode, tlsCa, readTimeoutMs, heartbeatMs, restartOnError)
      // one live client per (endpoint, spool): repeated stream (re)starts
      // share the connection and keep appending to the same relay
      val feed = replicationFeeds.computeIfAbsent((s"$host:$port", path),
        _ => new ReplicationFeed(host, port, user, password, slaveServerId,
          path, tlsMode, tlsCa, readTimeoutMs, heartbeatMs, restartOnError))
      // cache-hit guard: a restart with changed credentials/TLS/timeout
      // options must fail loudly, not silently keep the old connection.
      // (The key stays (endpoint, spool) — two feeds with different
      // options appending to ONE relay spool would corrupt it.)
      require(feed.optionsFingerprint == wanted,
        s"a replication feed for $host:$port already owns spool '$path' with " +
          "different options (credentials/TLS/timeouts); stop the old stream and " +
          "use a fresh spool directory, or restart with the original options")
      feed
    }
    else Option(options.get("socket")) match {
      case Some(hp) =>
        // host:port with a clear error (last ':' so IPv6 hosts parse)
        val cut = hp.lastIndexOf(':')
        require(cut > 0 && cut < hp.length - 1 &&
          hp.substring(cut + 1).forall(_.isDigit),
          s"socket option must be host:port, got '$hp'")
        val (h, p) = (hp.substring(0, cut), hp.substring(cut + 1).toInt)
        val rotate = Option(options.get("spoolRotate")).map(_.toLong).getOrElse(100000L)
        // one live feed per (endpoint, spool); a later stream's
        // spoolRotate is intentionally ignored — rotation belongs to the
        // feed that owns the spool, not to each reader
        socketFeeds.computeIfAbsent((hp, path),
          _ => new SpoolingSocketFeed(h, p, path, rotate))
      case None => new ReplayFeed(path)
    }
}

/** One slice of one feed segment: events [fromLine, toLine). Carries the
  * feed path and segment encoding so the executor can re-construct the
  * feed locally. */
case class FeedSlicePartition(path: String, segment: String,
    fromLine: Long, toLine: Long, format: String = "jsonl") extends InputPartition

class ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FeedSlicePartition]
    // "replication" partitions read the spooled binary relay segments —
    // executors never touch the server connection (driver-side feed)
    val feed: EventFeed =
      if (p.format == "binlog" || p.format == "replication") new BinlogFileFeed(p.path)
      else new ReplayFeed(p.path)
    new FeedPartitionReader(feed.open(p.segment, p.fromLine, p.toLine))
  }
}

/** Adapts the typed [[FeedEventReader]] to Catalyst rows — the ONLY place
  * feed events touch Spark types, so alternate feed implementations stay
  * Spark-free. */
class FeedPartitionReader(reader: FeedEventReader) extends PartitionReader[InternalRow] {

  override def next(): Boolean = reader.next()
  override def get(): InternalRow = toRow(reader.get())
  override def close(): Unit = reader.close()

  private def utf8(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  private def toRow(e: FeedEvent): InternalRow = {
    val colNames: GenericArrayData =
      if (e.colNames == null) null
      else new GenericArrayData(e.colNames.map(utf8(_): Any))
    val rows: GenericArrayData =
      if (e.rows == null) null
      else new GenericArrayData(e.rows.map(r =>
        new GenericArrayData(r.map(utf8(_): Any)): Any))
    InternalRow(
      utf8(e.eventType), utf8(e.binlogFile), e.binlogPosition,
      utf8(e.database), utf8(e.table), colNames, rows)
  }
}
