package graft.streaming

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, IOException, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Redis-backed [[QueueConnector]] — the production backend of the
  * reference's HITL/review queue (its connector is a thin wrapper over
  * redis-py lists: unstract/connectors/src/unstract/connectors/queues/
  * unstract_queue.py:9-130, rpush/lpop/llen/lindex/lset/lrange/keys/
  * expire). No Redis client library ships in this sandbox, so the
  * client speaks the actual wire protocol: RESP2 framing is ~40 lines
  * (arrays of bulk strings out; simple/error/integer/bulk/array replies
  * back), implemented in [[Resp]] below and proven live against an
  * in-process RESP server in QueueContractSpec — the same contract
  * suite the Memory/Jdbc/Directory backends pass.
  *
  * Scale shape: one socket per connector instance, instances are
  * Serializable with a @transient connection that each executor
  * re-opens on first use — 1000 executors hold 1000 connections, not
  * one driver bottleneck. TTL is server-side (Redis `EXPIRE`), so the
  * lazy-purge semantics come from the server, exactly as in
  * production. A dropped connection is retried once with a fresh
  * socket before surfacing the IOException.
  */
class RedisQueue(host: String, port: Int,
    connectTimeoutMs: Int = 5000, readTimeoutMs: Int = 30000)
    extends QueueConnector {

  @transient private var sock: Socket = _
  @transient private var in: InputStream = _
  @transient private var out: OutputStream = _

  private def ensureOpen(): Unit = synchronized {
    if (sock == null || sock.isClosed || !sock.isConnected) {
      val s = new Socket()
      s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      s.setSoTimeout(readTimeoutMs)
      s.setTcpNoDelay(true)
      sock = s
      in = new BufferedInputStream(s.getInputStream)
      out = new BufferedOutputStream(s.getOutputStream)
    }
  }

  private def closeQuietly(): Unit = synchronized {
    if (sock != null) { try sock.close() catch { case _: IOException => () }; sock = null }
  }

  /** Commands whose effect is identical if the server executes them a
    * second time — safe to re-send even when the request already
    * flushed and only the reply was lost. RPUSH and LPOP are NOT here:
    * replaying a flushed RPUSH enqueues a duplicate, and replaying a
    * flushed LPOP silently discards the message the first pop removed. */
  private val idempotentCmds =
    Set("PING", "LLEN", "LINDEX", "LRANGE", "KEYS", "LSET", "EXPIRE", "DEL")

  /** One command round trip. A failure before the request bytes flush
    * always gets one fresh-socket retry (the server never saw the
    * command). A failure after the flush means the command may have
    * executed and only the reply was lost — retried only for
    * idempotent commands; RPUSH/LPOP surface the IOException so the
    * caller can reconcile instead of duplicating or dropping a
    * message (the redis-py `retry_on_error` caveat). */
  private def call(args: String*): Resp.Reply = synchronized {
    var sent = false
    def once(): Resp.Reply = {
      sent = false
      ensureOpen()
      out.write(Resp.encodeCommand(args))
      out.flush()
      sent = true
      Resp.readReply(in)
    }
    try once()
    catch {
      case e: IOException =>
        closeQuietly()
        if (!sent || idempotentCmds(args.head.toUpperCase)) once() else throw e
    }
  }

  private def intReply(args: String*): Long = call(args: _*) match {
    case Resp.IntReply(n) => n
    case Resp.ErrReply(m) => throw new RedisReplyException(m)
    case other => throw new RedisReplyException(s"unexpected reply $other")
  }
  private def bulkReply(args: String*): Option[String] = call(args: _*) match {
    case Resp.BulkReply(s) => s
    case Resp.ErrReply(m) => throw new RedisReplyException(m)
    case other => throw new RedisReplyException(s"unexpected reply $other")
  }
  private def arrayReply(args: String*): Seq[String] = call(args: _*) match {
    case Resp.ArrayReply(items) => items.flatten
    case Resp.ErrReply(m) => throw new RedisReplyException(m)
    case other => throw new RedisReplyException(s"unexpected reply $other")
  }

  def enqueue(queue: String, message: String): Unit =
    intReply("RPUSH", queue, message)
  def dequeue(queue: String): Option[String] = bulkReply("LPOP", queue)
  def llen(queue: String): Long = intReply("LLEN", queue)
  def lindex(queue: String, index: Int): Option[String] =
    bulkReply("LINDEX", queue, index.toString)
  def lset(queue: String, index: Int, value: String): Unit =
    call("LSET", queue, index.toString, value) match {
      case Resp.ErrReply(m) if m.toLowerCase.contains("index out of range") =>
        throw new IllegalArgumentException(s"index $index out of range")
      case Resp.ErrReply(m) => throw new RedisReplyException(m)
      case _ => ()
    }
  def lrange(queue: String, start: Int, end: Int): Seq[String] =
    arrayReply("LRANGE", queue, start.toString, end.toString)
  // KEYS returns server-order; the contract (and the reference's sorted
  // UI listing) wants deterministic order, so sort client-side.
  def keys(pattern: String): Seq[String] = arrayReply("KEYS", pattern).sorted
  def expire(queue: String, ttlSeconds: Long): Unit =
    intReply("EXPIRE", queue, ttlSeconds.toString)
  def delete(queue: String): Unit = intReply("DEL", queue)

  override def testCredentials(): Boolean =
    scala.util.Try(call("PING") == Resp.SimpleReply("PONG")).getOrElse(false)

  def close(): Unit = closeQuietly()
}

/** A server-side `-ERR …` reply surfaced as an exception. */
final class RedisReplyException(message: String) extends RuntimeException(message)

/** RESP2 wire codec (https://redis.io/docs/reference/protocol-spec/ —
  * public spec): commands go out as arrays of bulk strings; replies are
  * one of five framed types. Shared by the client above and the
  * in-process test server. */
object Resp {
  sealed trait Reply
  final case class SimpleReply(s: String) extends Reply
  final case class ErrReply(msg: String) extends Reply
  final case class IntReply(n: Long) extends Reply
  /** None = null bulk ($-1). */
  final case class BulkReply(s: Option[String]) extends Reply
  /** Inner None = null element. */
  final case class ArrayReply(items: Seq[Option[String]]) extends Reply

  def encodeCommand(args: Seq[String]): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    sb.write(s"*${args.size}\r\n".getBytes(UTF_8))
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      sb.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      sb.write(b)
      sb.write("\r\n".getBytes(UTF_8))
    }
    sb.toByteArray
  }

  def encodeReply(r: Reply): Array[Byte] = {
    def bulk(s: Option[String]): String = s match {
      case None => "$-1\r\n"
      case Some(v) =>
        val b = v.getBytes(UTF_8); s"$$${b.length}\r\n$v\r\n"
    }
    (r match {
      case SimpleReply(s) => s"+$s\r\n"
      case ErrReply(m) => s"-ERR $m\r\n"
      case IntReply(n) => s":$n\r\n"
      case BulkReply(s) => bulk(s)
      case ArrayReply(items) => s"*${items.size}\r\n" + items.map(bulk).mkString
    }).getBytes(UTF_8)
  }

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("connection closed mid-frame")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new IOException("malformed RESP line terminator")
    sb.toString
  }

  private def readBulk(in: InputStream, len: Int): Option[String] =
    if (len < 0) None
    else {
      val buf = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val n = in.read(buf, off, len - off)
        if (n < 0) throw new EOFException("connection closed mid-bulk")
        off += n
      }
      if (in.read() != '\r' || in.read() != '\n')
        throw new IOException("malformed bulk terminator")
      Some(new String(buf, UTF_8))
    }

  def readReply(in: InputStream): Reply = in.read() match {
    case '+' => SimpleReply(readLine(in))
    case '-' => ErrReply(readLine(in).stripPrefix("ERR "))
    case ':' => IntReply(readLine(in).toLong)
    case '$' => BulkReply(readBulk(in, readLine(in).toInt))
    case '*' =>
      val n = readLine(in).toInt
      if (n < 0) ArrayReply(Seq.empty)
      else ArrayReply((0 until n).map { _ =>
        in.read() match {
          case '$' => readBulk(in, readLine(in).toInt)
          case t => throw new IOException(s"unsupported nested RESP type '${t.toChar}'")
        }
      })
    case -1 => throw new EOFException("connection closed")
    case t => throw new IOException(s"unknown RESP type byte '${t.toChar}'")
  }

  /** Read one inbound command (an array of bulk strings) server-side. */
  def readCommand(in: InputStream): Option[Seq[String]] = {
    val first = in.read()
    if (first < 0) return None
    if (first != '*') throw new IOException(s"expected command array, got '${first.toChar}'")
    val n = readLine(in).toInt
    Some((0 until n).map { _ =>
      if (in.read() != '$') throw new IOException("expected bulk string in command")
      readBulk(in, readLine(in).toInt)
        .getOrElse(throw new IOException("null arg in command"))
    })
  }
}
