package graft.streaming

import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.mutable

/** In-process RESP2 server implementing the Redis-list subset the
  * reference's queue connector uses (RPUSH/LPOP/LLEN/LINDEX/LSET/
  * LRANGE/KEYS/EXPIRE/DEL/PING) so [[RedisQueue]]'s wire client is
  * exercised over a REAL loopback socket — framing, bulk strings,
  * error replies, reconnects — without a Redis binary in the sandbox.
  *
  * Semantics mirror Redis: negative indexes count from the tail, a
  * drained list's key ceases to exist, EXPIRE arms a key-level
  * deadline, expired keys are purged lazily on first touch. The clock
  * is injected so the contract's TTL cases run without sleeping.
  */
final class MiniRedisServer(clock: () => Long) {
  private val server = new ServerSocket(0, 16, InetAddress.getLoopbackAddress)
  def port: Int = server.getLocalPort

  private final class Entry {
    val items = mutable.ArrayBuffer[String]()
    var expiresAt: Option[Long] = None
  }
  private val state = mutable.LinkedHashMap[String, Entry]()

  /** Fault injection: set to a command name (e.g. "RPUSH") to make the
    * next matching command EXECUTE server-side but lose its reply —
    * the connection closes before the reply bytes are written. Models
    * the ambiguous lost-reply failure a client cannot distinguish from
    * a command that never ran. One-shot: clears itself after firing. */
  val dropReplyFor = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Lazy purge-on-touch, as Redis does for expired keys. */
  private def alive(key: String): Option[Entry] = state.synchronized {
    state.get(key).filter { e =>
      val ok = e.expiresAt.forall(_ > clock())
      if (!ok) state.remove(key)
      ok
    }
  }

  private def dispatch(cmd: Seq[String]): Resp.Reply = state.synchronized {
    import Resp._
    def norm(i: Int, n: Int): Int = if (i < 0) n + i else i
    cmd.head.toUpperCase match {
      case "PING" => SimpleReply("PONG")
      case "RPUSH" =>
        val key = cmd(1)
        alive(key) // purge an expired list before reusing its name
        val e = state.getOrElseUpdate(key, new Entry)
        cmd.drop(2).foreach(e.items += _)
        IntReply(e.items.size.toLong)
      case "LPOP" =>
        alive(cmd(1)) match {
          case Some(e) if e.items.nonEmpty =>
            val v = e.items.remove(0)
            if (e.items.isEmpty) state.remove(cmd(1)) // empty list key vanishes
            BulkReply(Some(v))
          case _ => BulkReply(None)
        }
      case "LLEN" => IntReply(alive(cmd(1)).map(_.items.size.toLong).getOrElse(0L))
      case "LINDEX" =>
        alive(cmd(1)) match {
          case Some(e) =>
            val i = norm(cmd(2).toInt, e.items.size)
            BulkReply(if (i >= 0 && i < e.items.size) Some(e.items(i)) else None)
          case None => BulkReply(None)
        }
      case "LSET" =>
        alive(cmd(1)) match {
          case Some(e) =>
            val i = norm(cmd(2).toInt, e.items.size)
            if (i >= 0 && i < e.items.size) { e.items(i) = cmd(3); SimpleReply("OK") }
            else ErrReply("index out of range")
          case None => ErrReply("no such key")
        }
      case "LRANGE" =>
        alive(cmd(1)) match {
          case Some(e) =>
            val (from, until) =
              QueueConnector.sliceBounds(e.items.size, cmd(2).toInt, cmd(3).toInt)
            ArrayReply(e.items.slice(from, until).toSeq.map(Some(_)))
          case None => ArrayReply(Seq.empty)
        }
      case "KEYS" =>
        val live = state.keys.toSeq.filter(alive(_).isDefined)
        ArrayReply(QueueConnector.globFilter(live, cmd(1)).map(Some(_)))
      case "EXPIRE" =>
        alive(cmd(1)) match {
          case Some(e) => e.expiresAt = Some(clock() + cmd(2).toLong); IntReply(1)
          case None => IntReply(0)
        }
      case "DEL" =>
        IntReply(cmd.drop(1).count(state.remove(_).isDefined).toLong)
      case other => ErrReply(s"unknown command '$other'")
    }
  }

  private def serve(sock: Socket): Unit = {
    val in = new java.io.BufferedInputStream(sock.getInputStream)
    val out = new java.io.BufferedOutputStream(sock.getOutputStream)
    try {
      var cmd = Resp.readCommand(in)
      while (cmd.isDefined) {
        val reply = Resp.encodeReply(dispatch(cmd.get))
        if (cmd.get.head.equalsIgnoreCase(dropReplyFor.get())) {
          dropReplyFor.set(null)
          return // executed, reply dropped, connection closed (see finally)
        }
        out.write(reply)
        out.flush()
        cmd = Resp.readCommand(in)
      }
    } catch { case _: java.io.IOException => () }
    finally sock.close()
  }

  private val acceptor = new Thread(() => {
    try while (true) {
      val sock = server.accept()
      val t = new Thread(() => serve(sock), s"mini-redis-conn-$port")
      t.setDaemon(true)
      t.start()
    } catch { case _: java.io.IOException => () } // closed
  }, s"mini-redis-accept-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = server.close()
}
