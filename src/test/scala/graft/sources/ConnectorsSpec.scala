package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** S7: the staging-connector contract — a remote namespace is listed
  * and copied into execution staging; downstream stages only ever see
  * the staged directory. */
class ConnectorsSpec extends SparkSpec {

  private lazy val remote: String = {
    val dir = Files.createTempDirectory("graft-remote")
    Files.write(dir.resolve("inv_1.txt"), "invoice one".getBytes("UTF-8"))
    Files.write(dir.resolve("inv_2.txt"), "invoice two".getBytes("UTF-8"))
    Files.write(dir.resolve("notes.md"), "not matched".getBytes("UTF-8"))
    dir.toString
  }

  test("credentials probe, remote listing with glob") {
    val c = new HadoopFsConnector()
    assert(c.testCredentials(spark, remote))
    assert(!c.testCredentials(spark, "/no/such/root/anywhere"))
    val listed = c.listRemote(spark, remote, "*.txt")
      .select("file_name").collect().map(_.getString(0)).sorted
    assert(listed.toSeq == Seq("inv_1.txt", "inv_2.txt"))
  }

  test("copyToStaging stages matching files; FileScan runs connector-agnostic") {
    val staging = Files.createTempDirectory("graft-staging").toString
    val c = ConnectorRegistry.get("hadoop_fs").get
    val staged = c.copyToStaging(spark, remote, "*.txt", staging)
    assert(staged.count() == 2)
    assert(new java.io.File(staging, "inv_1.txt").exists())
    assert(!new java.io.File(staging, "notes.md").exists())
    // the staged dir is a normal FileScan source — the pipeline never
    // knows which connector produced it
    val scanned = FileScan.scan(spark, FileScan.ScanConfig(staging))
    assert(scanned.count() == 2)
    val body = new String(Files.readAllBytes(
      java.nio.file.Paths.get(staging, "inv_2.txt")), "UTF-8")
    assert(body == "invoice two")
  }

  test("registry resolves connectors by name") {
    assert(ConnectorRegistry.list.contains("hadoop_fs"))
    assert(ConnectorRegistry.get("s3a").nonEmpty)
    assert(ConnectorRegistry.get("http").nonEmpty)        // non-Hadoop backend
    assert(ConnectorRegistry.get("google_drive").isEmpty) // SDK absent: not registered
  }

  test("HTTP connector: same contract on a non-Hadoop backend (canned file server)") {
    val c = new HttpStagingConnector(() => ConnectorsSpec.fileServer())
    assert(c.testCredentials(spark, ConnectorsSpec.httpRoot))
    assert(!c.testCredentials(spark, "https://files.example.com/missing/"))

    // listing = index-page hrefs + HEAD metadata; dirs/parents excluded
    val listed = c.listRemote(spark, ConnectorsSpec.httpRoot, "*.txt")
      .orderBy("file_name").collect()
    assert(listed.map(_.getAs[String]("file_name")).toSeq ===
      Seq("inv_1.txt", "inv_2.txt"))
    assert(listed.map(_.getAs[Long]("file_size")).toSeq ===
      Seq("invoice one".length.toLong, "invoice two".length.toLong))
    assert(listed.head.getAs[java.sql.Timestamp]("mtime").getTime > 0L)

    // staging copy runs executor-side; downstream FileScan is unchanged
    val staging = Files.createTempDirectory("graft-http-staging").toString
    val staged = c.copyToStaging(spark, ConnectorsSpec.httpRoot, "*.txt", staging)
    assert(staged.count() == 2)
    val body = new String(Files.readAllBytes(
      java.nio.file.Paths.get(staging, "inv_2.txt")), "UTF-8")
    assert(body == "invoice two")
    assert(!new java.io.File(staging, "notes.md").exists())
    val scanned = FileScan.scan(spark, FileScan.ScanConfig(staging))
    assert(scanned.count() == 2)
  }

  test("HTTP staging is distributed: listing frame spans >1 partition, every file staged") {
    val c = new HttpStagingConnector(() => ConnectorsSpec.bigFileServer())
    // the frame copyToStaging consumes partition-wise — per-file HEADs
    // and GETs run executor-side across these partitions, never on a
    // driver-collected list
    val listing = c.listRemote(spark, ConnectorsSpec.bigRoot, "*.txt")
    assert(listing.rdd.getNumPartitions > 1,
      s"listing collapsed to ${listing.rdd.getNumPartitions} partition(s)")
    assert(listing.count() == 8)
    val staging = Files.createTempDirectory("graft-http-staging-big").toString
    val staged = c.copyToStaging(spark, ConnectorsSpec.bigRoot, "*.txt", staging)
    assert(staged.count() == 8)
    (1 to 8).foreach { i =>
      val body = new String(Files.readAllBytes(
        java.nio.file.Paths.get(staging, s"f_$i.txt")), "UTF-8")
      assert(body == s"file $i")
    }
  }
}

/** Canned HTTP file server on the companion object — the transport
  * factory ships to executors in copyToStaging, so it must not capture
  * the suite instance. */
object ConnectorsSpec {
  val httpRoot = "https://files.example.com/drop"

  private val pages = Map(
    "inv_1.txt" -> "invoice one",
    "inv_2.txt" -> "invoice two",
    "notes.md" -> "not matched")

  val bigRoot = "https://files.example.com/bulk"

  def fileServer(): graft.tools.CannedTransport = server(httpRoot, pages)

  def bigFileServer(): graft.tools.CannedTransport =
    server(bigRoot, (1 to 8).map(i => s"f_$i.txt" -> s"file $i").toMap)

  private def server(root: String,
      pages: Map[String, String]): graft.tools.CannedTransport =
    new graft.tools.CannedTransport({ (method, url, _, _) =>
      val base = s"$root/"
      if (url == root || url == base) {
        if (method != "GET") graft.tools.HttpResponse.status(405)
        else graft.tools.HttpResponse(200, Map("Content-Type" -> "text/html"),
          ("""<html><body><a href="../">Parent</a>""" +
            """<a href="archive/">archive/</a>""" +
            pages.keys.toSeq.sorted.map(n => s"""<a href="$n">$n</a>""").mkString +
            """<a href="?C=M;O=A">sort</a></body></html>""").getBytes("UTF-8"))
      } else if (url.startsWith(base)) {
        val name = url.stripPrefix(base)
        pages.get(name) match {
          case Some(text) =>
            val bytes = text.getBytes("UTF-8")
            val headers = Map(
              "Content-Length" -> bytes.length.toString,
              "Last-Modified" -> "Tue, 11 Aug 2026 07:28:00 GMT")
            if (method == "HEAD") graft.tools.HttpResponse(200, headers, Array.emptyByteArray)
            else graft.tools.HttpResponse(200, headers, bytes)
          case None => graft.tools.HttpResponse.status(404, name)
        }
      } else graft.tools.HttpResponse.status(404, url)
    })
}
