package graft.streaming

import graft.SparkSpec

/** One behavior suite, three backends (S8/K4): every QueueConnector
  * implementation must satisfy the same Redis-list contract the
  * reference's queue connector declares (unstract_queue.py:9-130) —
  * FIFO order, batch pop, negative indexing, lset, glob keys, and
  * key-level TTL with lazy purge. The clock is injected so TTL cases
  * run without sleeping. */
class QueueContractSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  /** A settable fake clock (epoch seconds). @volatile because the
    * RedisQueue contract reads it on MiniRedisServer's connection
    * threads while the test thread mutates it — without the fence the
    * TTL cases could see a stale value. */
  final class FakeClock(@volatile var now: Long = 1000L) extends (() => Long) with Serializable {
    def apply(): Long = now
  }

  /** Servers and connectors opened by the contract factories, closed in
    * afterAll so sockets/acceptor threads don't outlive the suite. */
  private val openedResources = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  private def track[T](t: T)(close: T => Unit): T = { openedResources.add(() => close(t)); t }
  override def afterAll(): Unit = {
    openedResources.forEach(c => try c() catch { case _: Exception => () })
    super.afterAll()
  }

  private def derbyUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-qderby")
    s"jdbc:derby:$dir/qdb;create=true"
  }

  def queueContract(name: String, mk: FakeClock => QueueConnector): Unit = {

    test(s"$name: FIFO enqueue/dequeue, peek, llen") {
      val q = mk(new FakeClock)
      assert(q.dequeue("w") === None && q.llen("w") === 0)
      q.enqueue("w", "m1"); q.enqueue("w", "m2"); q.enqueue("w", "m3")
      assert(q.llen("w") === 3)
      assert(q.peek("w") === Some("m1"))
      assert(q.llen("w") === 3) // peek does not consume
      assert(q.dequeue("w") === Some("m1"))
      assert(q.dequeue("w") === Some("m2"))
      assert(q.dequeue("w") === Some("m3"))
      assert(q.dequeue("w") === None)
    }

    test(s"$name: dequeueBatch drains FIFO, bounded, non-blocking") {
      val q = mk(new FakeClock)
      (1 to 5).foreach(i => q.enqueue("b", s"m$i"))
      assert(q.dequeueBatch("b", 3) === Seq("m1", "m2", "m3"))
      assert(q.dequeueBatch("b", 10) === Seq("m4", "m5")) // fewer than count
      assert(q.dequeueBatch("b", 2) === Seq.empty)
      assert(q.dequeueBatch("b", 0) === Seq.empty)
      intercept[IllegalArgumentException](q.dequeueBatch("b", -1))
    }

    test(s"$name: lindex/lrange with Redis negative indexing; lset") {
      val q = mk(new FakeClock)
      (1 to 4).foreach(i => q.enqueue("r", s"m$i"))
      assert(q.lindex("r", 0) === Some("m1"))
      assert(q.lindex("r", -1) === Some("m4"))
      assert(q.lindex("r", 9) === None)
      assert(q.lrange("r", 0, -1) === Seq("m1", "m2", "m3", "m4"))
      assert(q.lrange("r", 1, 2) === Seq("m2", "m3"))
      assert(q.lrange("r", -2, -1) === Seq("m3", "m4"))
      assert(q.lrange("r", 3, 1) === Seq.empty) // invalid range
      q.lset("r", 1, "patched")
      assert(q.lrange("r", 0, -1) === Seq("m1", "patched", "m3", "m4"))
      q.lset("r", -1, "tail")
      assert(q.lindex("r", 3) === Some("tail"))
    }

    test(s"$name: keys glob patterns; drained keys do not exist") {
      val q = mk(new FakeClock)
      q.enqueue("review:wf1", "a"); q.enqueue("review:wf2", "b")
      q.enqueue("other", "c")
      assert(q.keys("review:*") === Seq("review:wf1", "review:wf2"))
      assert(q.keys("*").toSet === Set("review:wf1", "review:wf2", "other"))
      assert(q.keys("review:wf?") === Seq("review:wf1", "review:wf2"))
      // Redis semantics: a fully drained list's key disappears
      q.dequeue("review:wf1")
      assert(q.keys("*").toSet === Set("review:wf2", "other"))
    }

    test(s"$name: key-level TTL — expired queue reads empty and purges") {
      val clock = new FakeClock(1000)
      val q = mk(clock)
      q.enqueueWithExpire("t", "m1", ttlSeconds = 60)
      q.enqueue("t", "m2")
      assert(q.llen("t") === 2)
      clock.now = 1059
      assert(q.lrange("t", 0, -1) === Seq("m1", "m2")) // still alive
      clock.now = 1060
      assert(q.llen("t") === 0)       // deadline hit: reads empty
      assert(q.dequeue("t") === None)
      assert(!q.keys("*").contains("t"))
      // the name is reusable after the purge
      q.enqueue("t", "fresh")
      assert(q.dequeue("t") === Some("fresh"))
    }

    test(s"$name: enqueueWithExpire refreshes the deadline (rpush_with_expire)") {
      val clock = new FakeClock(1000)
      val q = mk(clock)
      q.enqueueWithExpire("f", "m1", 60)
      clock.now = 1050
      q.enqueueWithExpire("f", "m2", 60) // deadline moves to 1110
      clock.now = 1100
      assert(q.lrange("f", 0, -1) === Seq("m1", "m2"))
      clock.now = 1110
      assert(q.llen("f") === 0)
    }

    test(s"$name: delete removes the queue outright") {
      val q = mk(new FakeClock)
      q.enqueue("d", "m")
      q.delete("d")
      assert(q.llen("d") === 0 && q.dequeue("d") === None)
    }

    test(s"$name: credentials probe succeeds against the live backend") {
      assert(mk(new FakeClock).testCredentials())
    }
  }

  queueContract("MemoryQueue", clk =>
    new MemoryQueue(s"ns-${java.util.UUID.randomUUID()}", clk))
  queueContract("JdbcQueue", clk => new JdbcQueue(derbyUrl(), clock = clk))
  queueContract("DirectoryQueue", clk => new DirectoryQueue(
    java.nio.file.Files.createTempDirectory("graft-dirq").toString, clk))
  // the production backend shape: the RESP wire client against a live
  // loopback socket (MiniRedisServer owns the injected clock — TTL is
  // server-side in Redis, so the deadline lives server-side here too)
  queueContract("RedisQueue", clk => track(new RedisQueue("127.0.0.1",
    track(new MiniRedisServer(clk))(_.close()).port))(_.close()))

  private def neverDoubleDelivers(name: String, mk: () => QueueConnector): Unit =
    test(s"$name: concurrent consumers never double-deliver") {
      val q = mk()
      (1 to 40).foreach(i => q.enqueue("c", s"m$i"))
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val dup = new java.util.concurrent.atomic.AtomicBoolean(false)
      val threads = (1 to 4).map(_ => new Thread(() => {
        var m = q.dequeue("c")
        while (m.isDefined) {
          if (!got.add(m.get)) dup.set(true)
          m = q.dequeue("c")
        }
      }))
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(!dup.get, "a message was delivered twice")
      assert(got.size === 40)
    }

  neverDoubleDelivers("JdbcQueue (optimistic delete)",
    () => new JdbcQueue(derbyUrl()))
  neverDoubleDelivers("DirectoryQueue (rename claim)",
    () => new DirectoryQueue(
      java.nio.file.Files.createTempDirectory("graft-dirq-race").toString))

  test("RedisQueue: concurrent clients on separate sockets never double-deliver (server-side LPOP)") {
    val srv = new MiniRedisServer(() => System.currentTimeMillis() / 1000)
    val seed = new RedisQueue("127.0.0.1", srv.port)
    (1 to 40).foreach(i => seed.enqueue("c", s"m$i"))
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val dup = new java.util.concurrent.atomic.AtomicBoolean(false)
    // one socket PER consumer — atomicity must come from the server's
    // LPOP, not from client-side synchronization
    val threads = (1 to 4).map(_ => new Thread(() => {
      val q = new RedisQueue("127.0.0.1", srv.port)
      var m = q.dequeue("c")
      while (m.isDefined) {
        if (!got.add(m.get)) dup.set(true)
        m = q.dequeue("c")
      }
      q.close()
    }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(!dup.get, "a message was delivered twice")
    assert(got.size === 40)
    srv.close()
  }

  test("RedisQueue: reconnects transparently after the server drops the connection") {
    val srv = new MiniRedisServer(() => System.currentTimeMillis() / 1000)
    val q = new RedisQueue("127.0.0.1", srv.port)
    q.enqueue("r", "m1")
    q.close() // simulate a dropped connection between commands
    assert(q.dequeue("r") === Some("m1")) // one fresh-socket retry
    srv.close()
  }

  test("RedisQueue: lost reply after a flushed RPUSH surfaces — no duplicate enqueue") {
    // the ambiguous fault: the server executed RPUSH but the reply was
    // lost. A blind retry would re-send it and enqueue the message
    // twice; the client must surface the IOException instead so the
    // caller can reconcile (the queue holds exactly one copy)
    val srv = new MiniRedisServer(() => System.currentTimeMillis() / 1000)
    val q = new RedisQueue("127.0.0.1", srv.port)
    q.enqueue("lr", "m0") // warm the connection
    srv.dropReplyFor.set("RPUSH")
    intercept[java.io.IOException](q.enqueue("lr", "m1"))
    assert(q.llen("lr") === 2, "the flushed RPUSH must have executed exactly once")
    assert(q.lrange("lr", 0, -1) === Seq("m0", "m1"))
    q.close(); srv.close()
  }

  test("RedisQueue: lost reply after an idempotent command retries transparently") {
    val srv = new MiniRedisServer(() => System.currentTimeMillis() / 1000)
    val q = new RedisQueue("127.0.0.1", srv.port)
    q.enqueue("li", "m1"); q.enqueue("li", "m2")
    srv.dropReplyFor.set("LLEN")
    assert(q.llen("li") === 2) // re-sent on a fresh socket, same answer
    q.close(); srv.close()
  }

  test("readStream tails a colon-keyed DirectoryQueue (percent-encoded directory)") {
    import spark.implicits._
    // exactly the ResultCache key shape: DirectoryQueue writes it under
    // api_results%3Awf%3Aex/ — the streaming source must tail the SAME
    // encoded path or it silently reads zero rows
    val root = java.nio.file.Files.createTempDirectory("graft-qcolon").toString
    val q = new DirectoryQueue(root)
    q.enqueue("api_results:wf:ex", """{"doc":"a","score":1}""")
    q.enqueue("api_results:wf:ex", """{"doc":"b","score":2}""")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.LongType)))
    val name = s"colonq_${java.util.UUID.randomUUID().toString.take(8)}"
    val query = Queues.readStream(spark, root, "api_results:wf:ex", schema)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    assert(spark.table(name).select("doc").as[String].collect().toSet === Set("a", "b"))
  }

  test("JdbcQueue enqueue retries on plain SQLException(23505) — the Postgres driver shape") {
    val url = derbyUrl()
    val inserts = new java.util.concurrent.atomic.AtomicInteger(0)
    // wrap the live Derby connection: the FIRST INSERT executeUpdate
    // throws a plain SQLException with SQLState 23505 (PSQLException does
    // NOT extend SQLIntegrityConstraintViolationException) — the retry
    // loop must treat it as a lost seq race, not crash
    val q = new JdbcQueue(url) {
      override protected def connect(): java.sql.Connection = {
        val real = super.connect()
        def delegate(target: AnyRef, m: java.lang.reflect.Method, args: Array[AnyRef]): AnyRef =
          try m.invoke(target, (if (args == null) Array.empty[AnyRef] else args): _*)
          catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
        java.lang.reflect.Proxy.newProxyInstance(
          getClass.getClassLoader, Array(classOf[java.sql.Connection]),
          (_, method, args) => {
            val out = delegate(real, method, args)
            if (method.getName == "prepareStatement" &&
                args != null && args(0).toString.startsWith("INSERT INTO graft_queue ")) {
              val realPs = out.asInstanceOf[java.sql.PreparedStatement]
              java.lang.reflect.Proxy.newProxyInstance(
                getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
                (_, m2, a2) => {
                  if (m2.getName == "executeUpdate" && inserts.incrementAndGet() == 1)
                    throw new java.sql.SQLException(
                      "duplicate key value violates unique constraint", "23505")
                  delegate(realPs, m2, a2)
                })
            } else out
          }).asInstanceOf[java.sql.Connection]
      }
    }
    q.enqueue("px", "m1")                      // survives the injected 23505
    assert(inserts.get() >= 2, "enqueue did not retry the INSERT")
    assert(q.dequeue("px") === Some("m1"))     // and the message landed once
    // a non-duplicate SQLException must still propagate, not spin
    assert(!JdbcQueue.isDuplicateKey(new java.sql.SQLException("boom", "42000")))
    assert(JdbcQueue.isDuplicateKey(new java.sql.SQLException("dup", "23000")))
    assert(JdbcQueue.isDuplicateKey(
      new java.sql.SQLIntegrityConstraintViolationException("dup")))
  }

  test("JdbcQueue enqueue surfaces a PERSISTENT 23000 violation instead of spinning") {
    // MySQL files NOT NULL/FK/CHECK violations under the generic 23000
    // class — those never resolve by re-reading MAX(seq), so the retry
    // loop must be bounded and rethrow, not loop forever
    val url = derbyUrl()
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = new JdbcQueue(url) {
      override protected def connect(): java.sql.Connection = {
        val real = super.connect()
        def delegate(target: AnyRef, m: java.lang.reflect.Method, args: Array[AnyRef]): AnyRef =
          try m.invoke(target, (if (args == null) Array.empty[AnyRef] else args): _*)
          catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
        java.lang.reflect.Proxy.newProxyInstance(
          getClass.getClassLoader, Array(classOf[java.sql.Connection]),
          (_, method, args) => {
            val out = delegate(real, method, args)
            if (method.getName == "prepareStatement" &&
                args != null && args(0).toString.startsWith("INSERT INTO graft_queue ")) {
              val realPs = out.asInstanceOf[java.sql.PreparedStatement]
              java.lang.reflect.Proxy.newProxyInstance(
                getClass.getClassLoader, Array(classOf[java.sql.PreparedStatement]),
                (_, m2, a2) => {
                  if (m2.getName == "executeUpdate") {
                    attempts.incrementAndGet()
                    throw new java.sql.SQLException(
                      "Column 'MESSAGE' cannot be null", "23000")
                  }
                  delegate(realPs, m2, a2)
                })
            } else out
          }).asInstanceOf[java.sql.Connection]
      }
    }
    val e = intercept[java.sql.SQLException](q.enqueue("perr", "m"))
    assert(e.getSQLState === "23000")
    assert(attempts.get() === JdbcQueue.MaxSeqRaceRetries)
  }

  test("readStream on a *-named queue does not glob-match sibling queue directories") {
    import spark.implicits._
    // URLEncoder leaves `*` literal; un-escaped, queue "a*b" would tail
    // `a*b/*.msg` and swallow sibling "axxb"'s messages too
    val root = java.nio.file.Files.createTempDirectory("graft-qstar").toString
    val q = new DirectoryQueue(root)
    q.enqueue("a*b", """{"doc":"star","score":1}""")
    q.enqueue("axxb", """{"doc":"sibling","score":2}""")
    // round-trip stays lossless through the extra escaping
    assert(DirectoryQueue.dec(DirectoryQueue.enc("a*b")) === "a*b")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.LongType)))
    val name = s"starq_${java.util.UUID.randomUUID().toString.take(8)}"
    val query = Queues.readStream(spark, root, "a*b", schema)
      .writeStream.format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    assert(spark.table(name).select("doc").as[String].collect().toSet === Set("star"))
    assert(q.dequeue("a*b") === Some("""{"doc":"star","score":1}"""))
    assert(q.dequeue("axxb") === Some("""{"doc":"sibling","score":2}"""))
  }

  test("streaming pair: streamTo enqueues micro-batches, dequeueToDataFrame drains") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-qpair").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-qpair-ckpt").toString
    val srcDir = java.nio.file.Files.createTempDirectory("graft-qpair-src").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(srcDir, "in.json"),
      Seq("""{"doc":"a","score":1}""", """{"doc":"b","score":2}""")
        .mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("score", org.apache.spark.sql.types.LongType)))
    val in = spark.readStream.schema(schema).json(srcDir)
    val query = Queues.streamTo(in, "review", () => new DirectoryQueue(root),
      ckpt, ttlSeconds = Some(3600))
    query.awaitTermination()
    val drained = Queues.dequeueToDataFrame(spark, "review",
      () => new DirectoryQueue(root))
    assert(drained.select("doc").as[String].collect().toSet === Set("a", "b"))
    assert(new DirectoryQueue(root).llen("review") === 0)
  }
}
