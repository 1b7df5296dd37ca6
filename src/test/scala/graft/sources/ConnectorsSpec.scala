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
    assert(ConnectorRegistry.get("google_drive").isEmpty) // SDK absent: not registered
  }
}
