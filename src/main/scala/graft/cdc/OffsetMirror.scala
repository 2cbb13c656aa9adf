package graft.cdc

import java.io.{BufferedOutputStream, DataInputStream, BufferedInputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Offset mirrors (A16/A17 ops parity) — the reference's checkpoint
  * stores (`internal/cache/cache.local.go:20-86`, `cache.redis.go:21-80`):
  * key/file `binwatch.<serverId>.cache`, value `<file>/<position>`.
  *
  * In this engine Structured Streaming's own checkpoint is the source of
  * truth for resume (A16 — design decision, SURVEY §2.A); the mirror
  * exists for OPERATIONAL parity: anything that watches the reference's
  * cache key (dashboards, runbooks, the reference itself during a
  * migration) keeps seeing live offsets. Mirrored AFTER connector
  * delivery, like the reference's store-after-send
  * (blsenderwork.go:204-213) — at-least-once semantics unchanged. */
trait OffsetMirror extends AutoCloseable {
  def store(binlogFile: String, position: Long): Unit
  def load(): Option[(String, Long)]
  override def close(): Unit = ()
}

object OffsetMirror {
  /** Reference-parity parse of `<file>/<position>`: rejects whitespace,
    * requires exactly one '/', position must fit uint32
    * (cache.redis.go:52-73). Empty input = no stored location. */
  def parseLocation(s: String): Either[String, Option[(String, Long)]] = {
    if (s.isEmpty) Right(None)
    else if (s.exists(_.isWhitespace))
      Left("found spaces, must be <file>/<position> format")
    else {
      val parts = s.split("/", -1)
      if (parts.length != 2)
        Left("number of inconsistent '/', must be <file>/<position> format")
      else
        try {
          val pos = java.lang.Long.parseLong(parts(1))
          if (pos < 0 || pos > 0xffffffffL) Left("position format error: out of uint32 range")
          else Right(Some((parts(0), pos)))
        } catch {
          case _: NumberFormatException => Left("position format error")
        }
    }
  }

  def key(serverId: String): String = s"binwatch.$serverId.cache"
}

/** Local-file mirror — cache.local.go parity: one file
  * `<dir>/binwatch.<id>.cache` holding `<file>/<position>`. */
final class LocalOffsetMirror(dir: String, serverId: String) extends OffsetMirror {
  private val path = Paths.get(dir, OffsetMirror.key(serverId))
  Files.createDirectories(Paths.get(dir))
  if (!Files.exists(path)) Files.write(path, Array.emptyByteArray)

  override def store(binlogFile: String, position: Long): Unit = {
    // atomic replace: external watchers (the mirror's whole purpose)
    // must never observe a torn/empty value, and a crash mid-write must
    // not leave an unparseable file that blocks every later load()
    val tmp = Files.createTempFile(path.getParent, path.getFileName.toString, ".tmp")
    Files.write(tmp, s"$binlogFile/$position".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def load(): Option[(String, Long)] =
    OffsetMirror.parseLocation(
      new String(Files.readAllBytes(path), StandardCharsets.UTF_8)) match {
      case Right(loc) => loc
      case Left(err) => throw new IllegalStateException(
        s"error parsing location in '$path' cache file, $err")
    }
}

/** Minimal RESP2 client (public Redis serialization protocol) — enough
  * for AUTH/SET/GET against a real Redis or any RESP-speaking stub; no
  * client library vendored. Single connection, synchronized commands. */
final class RespClient(host: String, port: Int, password: Option[String] = None)
    extends AutoCloseable {

  private val socket = new Socket(host, port)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  password.foreach(p => command("AUTH", p))

  /** Send one command, return the reply (None = null bulk). Throws on
    * RESP error replies. */
  def command(args: String*): Option[String] = this.synchronized {
    val sb = new java.lang.StringBuilder
    sb.append('*').append(args.size).append("\r\n")
    args.foreach { a =>
      val b = a.getBytes(StandardCharsets.UTF_8)
      sb.append('$').append(b.length).append("\r\n").append(a).append("\r\n")
    }
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    out.flush()
    readReply()
  }

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c != '\r' && c != -1) { sb.append(c.toChar); c = in.read() }
    in.read() // '\n'
    sb.toString
  }

  private def readReply(): Option[String] = (in.read(): @unchecked) match {
    case '+' => Some(readLine())
    case ':' => Some(readLine())
    case '-' => throw new RuntimeException(s"redis error: ${readLine()}")
    case '$' =>
      val n = readLine().toInt
      if (n < 0) None
      else {
        val buf = new Array[Byte](n)
        in.readFully(buf)
        readLine() // trailing CRLF
        Some(new String(buf, StandardCharsets.UTF_8))
      }
    case '*' =>
      val n = readLine().toInt
      if (n < 0) None else { (0 until n).foreach(_ => readReply()); Some(n.toString) }
    case -1 => throw new RuntimeException("redis connection closed")
  }

  override def close(): Unit = socket.close()
}

/** Redis mirror — cache.redis.go parity: `SET binwatch.<id>.cache
  * "<file>/<position>"`; missing key on load = no location, no error. */
final class RedisOffsetMirror(client: RespClient, serverId: String) extends OffsetMirror {
  private val key = OffsetMirror.key(serverId)

  override def store(binlogFile: String, position: Long): Unit =
    client.command("SET", key, s"$binlogFile/$position")

  override def load(): Option[(String, Long)] =
    client.command("GET", key) match {
      case None => None
      case Some(s) => OffsetMirror.parseLocation(s) match {
        case Right(loc) => loc
        case Left(err) => throw new IllegalStateException(
          s"error parsing location in '$key' redis cache, $err")
      }
    }

  override def close(): Unit = client.close()
}
