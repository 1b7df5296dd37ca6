package graft.streaming

import java.sql.DriverManager
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Queue connector contract (SURVEY.md S8/K4): the reference feeds its
  * manual-review/HITL loop through a Redis-list-shaped queue API
  * (unstract/connectors/queues/unstract_queue.py:9-130 — enqueue,
  * dequeue(+batch), peek, llen, lindex, lset, lrange with Redis
  * negative indexing, glob keys) with key-level TTL applied by the
  * cache layer (rpush_with_expire). This trait factors that contract
  * out of any one backend; every implementation passes the same
  * QueueContractSpec suite.
  *
  * Implementations:
  *  - [[MemoryQueue]]: in-JVM Redis stand-in (tests, local mode).
  *  - [[JdbcQueue]]: database-backed queue — the reference's
  *    RDBMS-queue analog — proven LIVE on embedded Derby.
  *  - [[DirectoryQueue]]: Hadoop-FS directory dual (one file per
  *    message) that Structured Streaming can tail as a file source.
  *
  * TTL semantics are key-level, as in Redis: `expire(queue, ttl)` arms
  * a deadline for the whole list; reads past the deadline see an empty
  * queue and lazily purge it. `enqueueWithExpire` refreshes the
  * deadline on every push (the rpush_with_expire shape).
  */
trait QueueConnector extends Serializable {
  def enqueue(queue: String, message: String): Unit
  def dequeue(queue: String): Option[String]
  def llen(queue: String): Long
  def lindex(queue: String, index: Int): Option[String]
  def lset(queue: String, index: Int, value: String): Unit
  def lrange(queue: String, start: Int, end: Int): Seq[String]
  def keys(pattern: String = "*"): Seq[String]
  def expire(queue: String, ttlSeconds: Long): Unit
  def delete(queue: String): Unit

  /** Credential/reachability probe (unstract_queue.py test_credentials);
    * backends with a real connection override. */
  def testCredentials(): Boolean = true

  /** rpush_with_expire: append and refresh the key TTL in one call. */
  def enqueueWithExpire(queue: String, message: String, ttlSeconds: Long): Unit = {
    enqueue(queue, message); expire(queue, ttlSeconds)
  }
  def peek(queue: String): Option[String] = lindex(queue, 0)
  /** Non-blocking FIFO batch pop; fewer than `count` when the queue
    * drains (unstract_queue.py dequeue_batch contract). */
  def dequeueBatch(queue: String, count: Int): Seq[String] = {
    require(count >= 0, "count must be non-negative")
    val out = mutable.ArrayBuffer[String]()
    var next = if (count == 0) None else dequeue(queue)
    while (next.isDefined) {
      out += next.get
      next = if (out.size < count) dequeue(queue) else None
    }
    out.toSeq
  }
}

object QueueConnector {
  /** Redis index resolution: negatives count from the tail; returns the
    * [from, until) slice bounds for a list of length n. */
  def sliceBounds(n: Int, start: Int, end: Int): (Int, Int) = {
    val s = math.max(if (start < 0) n + start else start, 0)
    val e = math.min(if (end < 0) n + end else end, n - 1)
    (math.min(s, n), math.max(s, e + 1))
  }
  def globFilter(names: Seq[String], pattern: String): Seq[String] = {
    val re = TextFunctions.globToRegex(pattern).r
    names.filter(re.findFirstIn(_).isDefined).sorted
  }
}

/** In-JVM Redis stand-in. State lives in a companion-object namespace so
  * every task in a local[k] run (same JVM) sees one queue; NOT a
  * multi-executor transport — production uses [[JdbcQueue]] or a Redis
  * connector with the same contract. `clock` is injectable so TTL tests
  * need no sleeping. */
final class MemoryQueue(namespace: String = "default",
    clock: () => Long = () => System.currentTimeMillis() / 1000)
    extends QueueConnector {
  import MemoryQueue._

  private def ns = state.getOrElseUpdate(namespace, TrieMap.empty)
  /** Purge-on-read: a queue past its deadline reads as absent. */
  private def alive(queue: String): Option[QState] =
    ns.get(queue).filter { s =>
      val ok = s.synchronized(s.expiresAt.forall(_ > clock()))
      if (!ok) ns.remove(queue)
      ok
    }

  def enqueue(queue: String, message: String): Unit = {
    alive(queue) // purge an expired list before reusing its name
    val s = ns.getOrElseUpdate(queue, new QState)
    s.synchronized(s.items += message)
  }
  def dequeue(queue: String): Option[String] = alive(queue).flatMap { s =>
    s.synchronized(if (s.items.isEmpty) None else Some(s.items.remove(0)))
  }
  def llen(queue: String): Long =
    alive(queue).map(s => s.synchronized(s.items.size.toLong)).getOrElse(0L)
  def lindex(queue: String, index: Int): Option[String] = alive(queue).flatMap { s =>
    s.synchronized {
      val i = if (index < 0) s.items.size + index else index
      if (i >= 0 && i < s.items.size) Some(s.items(i)) else None
    }
  }
  def lset(queue: String, index: Int, value: String): Unit = alive(queue).foreach { s =>
    s.synchronized {
      val i = if (index < 0) s.items.size + index else index
      require(i >= 0 && i < s.items.size, s"index $index out of range")
      s.items(i) = value
    }
  }
  def lrange(queue: String, start: Int, end: Int): Seq[String] =
    alive(queue).map { s =>
      s.synchronized {
        val (from, until) = QueueConnector.sliceBounds(s.items.size, start, end)
        s.items.slice(from, until).toSeq
      }
    }.getOrElse(Seq.empty)
  def keys(pattern: String): Seq[String] =
    // Redis semantics: a drained list's key does not exist
    QueueConnector.globFilter(
      ns.keys.toSeq.filter(q => llen(q) > 0), pattern)
  def expire(queue: String, ttlSeconds: Long): Unit = alive(queue).foreach { s =>
    s.synchronized(s.expiresAt = Some(clock() + ttlSeconds))
  }
  def delete(queue: String): Unit = ns.remove(queue)
}

object MemoryQueue {
  private final class QState {
    val items = mutable.ArrayBuffer[String]()
    var expiresAt: Option[Long] = None
  }
  private val state = TrieMap[String, TrieMap[String, QState]]()
}

/** Database-backed queue — the reference's RDBMS queue analog, runnable
  * in-sandbox on embedded Derby and unchanged on Postgres/MySQL (ANSI
  * SQL only: FETCH FIRST, no vendor locks). Messages are (queue, seq)
  * rows; dequeue is an optimistic min-seq SELECT + conditional DELETE
  * retried on a race, so concurrent consumers never double-deliver.
  * One connection per operation: the HITL loop is low-rate (humans);
  * pool connections if a deployment ever makes this hot.
  * Non-final: tests override the [[connect]] seam with fault-injecting
  * proxy connections. */
class JdbcQueue(url: String,
    driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
    clock: () => Long = () => System.currentTimeMillis() / 1000)
    extends QueueConnector {

  /** Connection seam — overridable so tests can wrap the live Derby
    * connection with fault-injecting proxies (e.g. a plain SQLException
    * carrying SQLState 23505, the shape PostgreSQL's driver throws). */
  protected def connect(): java.sql.Connection = {
    Class.forName(driver)
    DriverManager.getConnection(url)
  }

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = connect()
    try f(c) finally c.close()
  }

  override def testCredentials(): Boolean =
    scala.util.Try(withConn(_.isValid(5))).getOrElse(false)

  // idempotent bootstrap (metadata probe — Derby has no IF NOT EXISTS)
  withConn { c =>
    val md = c.getMetaData
    def missing(t: String) = { val rs = md.getTables(null, null, t, null)
      val absent = !rs.next(); rs.close(); absent }
    val st = c.createStatement()
    try {
      if (missing("GRAFT_QUEUE"))
        st.execute("CREATE TABLE graft_queue (queue_name VARCHAR(256) NOT NULL, " +
          "seq BIGINT NOT NULL, message CLOB, PRIMARY KEY (queue_name, seq))")
      if (missing("GRAFT_QUEUE_META"))
        st.execute("CREATE TABLE graft_queue_meta (queue_name VARCHAR(256) " +
          "PRIMARY KEY, expires_epoch BIGINT)")
    } finally st.close()
  }

  /** Key-level TTL: an armed deadline in the meta table; expired queues
    * are purged lazily on first read past the deadline. */
  private def purgeIfExpired(c: java.sql.Connection, queue: String): Unit = {
    val ps = c.prepareStatement(
      "SELECT expires_epoch FROM graft_queue_meta WHERE queue_name = ?")
    ps.setString(1, queue)
    val rs = ps.executeQuery()
    val expired = rs.next() && { val e = rs.getLong(1); !rs.wasNull() && e <= clock() }
    rs.close(); ps.close()
    if (expired) deleteIn(c, queue)
  }
  private def deleteIn(c: java.sql.Connection, queue: String): Unit =
    Seq("DELETE FROM graft_queue WHERE queue_name = ?",
      "DELETE FROM graft_queue_meta WHERE queue_name = ?").foreach { sql =>
      val ps = c.prepareStatement(sql); ps.setString(1, queue)
      ps.executeUpdate(); ps.close()
    }

  def enqueue(queue: String, message: String): Unit = withConn { c =>
    purgeIfExpired(c, queue)
    var done = false
    var races = 0
    while (!done) {
      val ps = c.prepareStatement("INSERT INTO graft_queue (queue_name, seq, message) " +
        "SELECT ?, COALESCE(MAX(seq), 0) + 1, ? FROM graft_queue WHERE queue_name = ?")
      ps.setString(1, queue); ps.setString(2, message); ps.setString(3, queue)
      // two producers can race to the same seq; the PK rejects the loser,
      // who just re-reads MAX(seq). Bounded: SQLState 23000 is the generic
      // integrity class (MySQL reports NOT NULL/FK there too), so a
      // persistent non-duplicate violation must surface, not spin.
      try { ps.executeUpdate(); done = true }
      catch { case e: java.sql.SQLException if JdbcQueue.isDuplicateKey(e) =>
        races += 1
        if (races >= JdbcQueue.MaxSeqRaceRetries) throw e }
      finally ps.close()
    }
  }

  def dequeue(queue: String): Option[String] = withConn { c =>
    purgeIfExpired(c, queue)
    var result: Option[String] = None
    var retry = true
    while (retry) {
      val ps = c.prepareStatement("SELECT seq, message FROM graft_queue " +
        "WHERE queue_name = ? ORDER BY seq FETCH FIRST 1 ROWS ONLY")
      ps.setString(1, queue)
      val rs = ps.executeQuery()
      if (!rs.next()) { retry = false }
      else {
        val (seq, msg) = (rs.getLong(1), rs.getString(2))
        rs.close(); ps.close()
        val del = c.prepareStatement(
          "DELETE FROM graft_queue WHERE queue_name = ? AND seq = ?")
        del.setString(1, queue); del.setLong(2, seq)
        // 0 rows = a concurrent consumer won the race; take the next row
        if (del.executeUpdate() == 1) { result = Some(msg); retry = false }
        del.close()
      }
    }
    result
  }

  def llen(queue: String): Long = withConn { c =>
    purgeIfExpired(c, queue)
    val ps = c.prepareStatement(
      "SELECT COUNT(*) FROM graft_queue WHERE queue_name = ?")
    ps.setString(1, queue)
    val rs = ps.executeQuery(); rs.next()
    val n = rs.getLong(1); rs.close(); ps.close(); n
  }

  private def seqAt(c: java.sql.Connection, queue: String, index: Int): Option[Long] = {
    val n = { val ps = c.prepareStatement(
      "SELECT COUNT(*) FROM graft_queue WHERE queue_name = ?")
      ps.setString(1, queue)
      val rs = ps.executeQuery(); rs.next(); val v = rs.getInt(1); rs.close(); ps.close(); v }
    val i = if (index < 0) n + index else index
    if (i < 0 || i >= n) None
    else {
      val ps = c.prepareStatement("SELECT seq FROM graft_queue WHERE queue_name = ? " +
        "ORDER BY seq OFFSET ? ROWS FETCH NEXT 1 ROWS ONLY")
      ps.setString(1, queue); ps.setInt(2, i)
      val rs = ps.executeQuery()
      val s = if (rs.next()) Some(rs.getLong(1)) else None
      rs.close(); ps.close(); s
    }
  }

  def lindex(queue: String, index: Int): Option[String] = withConn { c =>
    purgeIfExpired(c, queue)
    seqAt(c, queue, index).flatMap { seq =>
      val ps = c.prepareStatement(
        "SELECT message FROM graft_queue WHERE queue_name = ? AND seq = ?")
      ps.setString(1, queue); ps.setLong(2, seq)
      val rs = ps.executeQuery()
      val m = if (rs.next()) Option(rs.getString(1)) else None
      rs.close(); ps.close(); m
    }
  }

  def lset(queue: String, index: Int, value: String): Unit = withConn { c =>
    purgeIfExpired(c, queue)
    val seq = seqAt(c, queue, index)
      .getOrElse(throw new IllegalArgumentException(s"index $index out of range"))
    val ps = c.prepareStatement(
      "UPDATE graft_queue SET message = ? WHERE queue_name = ? AND seq = ?")
    ps.setString(1, value); ps.setString(2, queue); ps.setLong(3, seq)
    ps.executeUpdate(); ps.close()
  }

  def lrange(queue: String, start: Int, end: Int): Seq[String] = withConn { c =>
    purgeIfExpired(c, queue)
    val all = mutable.ArrayBuffer[String]()
    val ps = c.prepareStatement(
      "SELECT message FROM graft_queue WHERE queue_name = ? ORDER BY seq")
    ps.setString(1, queue)
    val rs = ps.executeQuery()
    while (rs.next()) all += rs.getString(1)
    rs.close(); ps.close()
    val (from, until) = QueueConnector.sliceBounds(all.size, start, end)
    all.slice(from, until).toSeq
  }

  def keys(pattern: String): Seq[String] = withConn { c =>
    // Redis semantics: only queues with ≥1 live message exist
    val names = mutable.Set[String]()
    val st = c.createStatement()
    val rs = st.executeQuery("SELECT DISTINCT queue_name FROM graft_queue")
    while (rs.next()) names += rs.getString(1)
    rs.close(); st.close()
    QueueConnector.globFilter(
      names.toSeq.filter { q => purgeIfExpired(c, q); llenIn(c, q) > 0 }, pattern)
  }
  private def llenIn(c: java.sql.Connection, queue: String): Long = {
    val ps = c.prepareStatement(
      "SELECT COUNT(*) FROM graft_queue WHERE queue_name = ?")
    ps.setString(1, queue)
    val rs = ps.executeQuery(); rs.next()
    val n = rs.getLong(1); rs.close(); ps.close(); n
  }

  def expire(queue: String, ttlSeconds: Long): Unit = withConn { c =>
    val upd = c.prepareStatement(
      "UPDATE graft_queue_meta SET expires_epoch = ? WHERE queue_name = ?")
    upd.setLong(1, clock() + ttlSeconds); upd.setString(2, queue)
    if (upd.executeUpdate() == 0) {
      val ins = c.prepareStatement(
        "INSERT INTO graft_queue_meta (queue_name, expires_epoch) VALUES (?, ?)")
      ins.setString(1, queue); ins.setLong(2, clock() + ttlSeconds)
      ins.executeUpdate(); ins.close()
    }
    upd.close()
  }

  def delete(queue: String): Unit = withConn(deleteIn(_, queue))
}

object JdbcQueue {
  /** Portable duplicate-key detection: Derby/MySQL throw
    * SQLIntegrityConstraintViolationException, but PostgreSQL's driver
    * throws a plain SQLException subclass that does NOT extend it —
    * there the signal is SQLState 23505 (unique violation) / 23000
    * (integrity violation, the X/Open class code some drivers report).
    * Matching on either keeps the seq-race retry working on every
    * ANSI backend, as the class scaladoc promises. */
  private[graft] def isDuplicateKey(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      e.getSQLState == "23505" || e.getSQLState == "23000"

  /** A real seq race resolves in a handful of retries even under heavy
    * contention; anything still failing after this many attempts is a
    * persistent constraint violation misfiled under 23000. */
  private[graft] val MaxSeqRaceRetries = 32
}

/** Filesystem directory dual: one file per message under
  * `<root>/<queue>/`, named by a zero-padded monotonic stamp so
  * lexicographic order = enqueue order; TTL deadline in a `__meta`
  * sibling. Runs on any Hadoop FS (local, HDFS, s3a) and doubles as a
  * Structured Streaming source/sink directory ([[Queues.readStream]]).
  * Ordering across concurrent producers is best-effort (stamp-based) —
  * exact cross-process FIFO needs [[JdbcQueue]] or Redis. */
final class DirectoryQueue(root: String,
    clock: () => Long = () => System.currentTimeMillis() / 1000)
    extends QueueConnector {
  import org.apache.hadoop.fs.Path

  @transient private lazy val fs =
    new Path(root).getFileSystem(new org.apache.hadoop.conf.Configuration())

  override def testCredentials(): Boolean =
    scala.util.Try { fs.mkdirs(new Path(root)); fs.exists(new Path(root)) }
      .getOrElse(false)

  import DirectoryQueue.{dec, enc}
  private def qdir(queue: String) = new Path(root, enc(queue))
  private def metaPath(queue: String) = new Path(qdir(queue), "__meta")

  private def readMeta(queue: String): Option[Long] = {
    val p = metaPath(queue)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong)
      finally in.close()
    }
  }
  private def alive(queue: String): Boolean = {
    if (!fs.exists(qdir(queue))) return false
    readMeta(queue) match {
      case Some(deadline) if deadline <= clock() => delete(queue); false
      case _ => true
    }
  }
  private def messageFiles(queue: String): Seq[Path] =
    if (!alive(queue)) Seq.empty
    else fs.listStatus(qdir(queue)).map(_.getPath)
      .filter(_.getName.endsWith(".msg")).sortBy(_.getName).toSeq

  private def write(p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
  private def read(p: Path): String = {
    val in = fs.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }

  def enqueue(queue: String, message: String): Unit = {
    alive(queue) // purge an expired queue before reuse
    val name = f"${clock()}%016d-${System.nanoTime()}%020d-${
      java.util.UUID.randomUUID().toString.take(8)}.msg"
    write(new Path(qdir(queue), name), message)
  }
  def dequeue(queue: String): Option[String] = {
    // claim by atomic rename BEFORE reading: read-then-delete would let
    // two consumers deliver the same message (rename has exactly one
    // winner on any Hadoop FS; the loser moves to the next file)
    var result: Option[String] = None
    var candidates = messageFiles(queue)
    while (result.isEmpty && candidates.nonEmpty) {
      val p = candidates.head
      val claimed = new Path(p.getParent,
        p.getName.stripSuffix(".msg") + s".claimed-${java.util.UUID.randomUUID().toString.take(8)}")
      if (scala.util.Try(fs.rename(p, claimed)).getOrElse(false)) {
        val m = read(claimed)
        fs.delete(claimed, false)
        result = Some(m)
      } else candidates = candidates.tail
    }
    result
  }
  def llen(queue: String): Long = messageFiles(queue).size.toLong
  def lindex(queue: String, index: Int): Option[String] = {
    val files = messageFiles(queue)
    val i = if (index < 0) files.size + index else index
    if (i >= 0 && i < files.size) Some(read(files(i))) else None
  }
  def lset(queue: String, index: Int, value: String): Unit = {
    val files = messageFiles(queue)
    val i = if (index < 0) files.size + index else index
    require(i >= 0 && i < files.size, s"index $index out of range")
    write(files(i), value)
  }
  def lrange(queue: String, start: Int, end: Int): Seq[String] = {
    val files = messageFiles(queue)
    val (from, until) = QueueConnector.sliceBounds(files.size, start, end)
    files.slice(from, until).map(read)
  }
  def keys(pattern: String): Seq[String] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else QueueConnector.globFilter(
      fs.listStatus(rootPath).filter(_.isDirectory).map(s => dec(s.getPath.getName))
        .filter(q => llen(q) > 0).toSeq, pattern) // drained key ≡ absent
  }
  def expire(queue: String, ttlSeconds: Long): Unit =
    if (fs.exists(qdir(queue))) write(metaPath(queue), (clock() + ttlSeconds).toString)
  def delete(queue: String): Unit = fs.delete(qdir(queue), true)
}

object DirectoryQueue {
  /** Queue names may carry chars Path rejects (the reference keys lists
    * as "api_results:wf:ex") — percent-encode for the directory name.
    * Shared by the connector AND [[Queues.readStream]]: the writer and
    * the streaming tail must agree on the on-disk name, or colon-keyed
    * queues stream zero rows. */
  private[graft] def enc(queue: String): String =
    // URLEncoder leaves `*` literal — the one glob metachar that would
    // make readStream's `$root/<enc>/*.msg` pattern match SIBLING queue
    // directories. Encode it so the on-disk name is glob-inert.
    java.net.URLEncoder.encode(queue, "UTF-8").replace("*", "%2A")
  private[graft] def dec(dirName: String): String =
    java.net.URLDecoder.decode(dirName, "UTF-8")
}

/** DataFrame/streaming bridges over the queue contract. */
object Queues {

  /** Distributed enqueue: each partition opens its own connector and
    * pushes its rows as JSON — no driver collect, scales with
    * executors. `mk` must construct the connector ON the executor. */
  def enqueueDataFrame(df: DataFrame, queue: String,
      mk: () => QueueConnector, ttlSeconds: Option[Long] = None): Unit = {
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      val q = mk()
      it.foreach(q.enqueue(queue, _))
    }
    // TTL armed once on the driver after the push lands (key-level)
    ttlSeconds.foreach(mk().expire(queue, _))
  }

  /** Streaming queue sink: every micro-batch lands in the queue via the
    * distributed enqueue (the HITL/result-cache foreachBatch writer). */
  def streamTo(out: DataFrame, queue: String, mk: () => QueueConnector,
      checkpoint: String, ttlSeconds: Option[Long] = None): StreamingQuery =
    out.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        enqueueDataFrame(batch.toDF(), queue, mk, ttlSeconds)
      }
      .start()

  /** Consumer bridge: bounded FIFO drain into a DataFrame (JSON-parsed).
    * Bounded by contract like the API sink — a human-review batch, not
    * a table scan. */
  def dequeueToDataFrame(spark: SparkSession, queue: String,
      mk: () => QueueConnector, max: Int = 1000): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(mk().dequeueBatch(queue, max)))
  }

  /** Streaming source over a [[DirectoryQueue]]'s directory: tail new
    * message files as they arrive (the queue→stream side of the pair).
    * The path goes through the SAME percent-encoding as
    * [[DirectoryQueue]]'s writer — a colon-keyed queue (the
    * `api_results:wf:ex` shape ResultCache produces) lives in
    * `api_results%3Awf%3Aex/`, and tailing the raw name would silently
    * read zero rows. */
  def readStream(spark: SparkSession, root: String, queue: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1000)
      .json(s"$root/${DirectoryQueue.enc(queue)}/*.msg")
}
