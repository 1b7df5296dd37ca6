package graft

import org.apache.spark.sql.DataFrame

/** The durable-staging materialization seam shared by every multi-pass
  * operator tier (dedup, corpus, LM, workflow).
  *
  * Default (local mode): `localCheckpoint` — fast, but pinned to
  * executors, so a lost executor kills the job. Durable mode (the
  * tier's staging conf key set to a parquet-capable path): write-then-
  * read a staged table, so any lost task recomputes from the staged
  * files — the configuration a 100 TB run uses (SCALE.md). One
  * implementation here so a change to the seam (cleanup policy, conf
  * plumbing) cannot silently diverge between tiers.
  *
  * Cleanup policy: every staged directory this process writes is
  * tracked; call [[cleanup]] once the run's OUTPUTS have been consumed
  * or persisted elsewhere to delete all of them. Deletion cannot be
  * automatic per-materialize — the returned DataFrame READS from the
  * staged files, and callers (Curation.run, the dedup passes) hand
  * such frames back to their callers — so the staging root is scratch
  * space owned by the session: either call [[cleanup]] at the end of a
  * run, or purge the root externally between runs.
  */
object Staging {

  private val staged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def materialize(df: DataFrame, tag: String, confKey: String): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(confKey) match {
      case Some(root) =>
        val path = s"$root/${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
        df.write.mode("overwrite").parquet(path)
        staged.add(path)
        s.read.parquet(path)
      case None => df.localCheckpoint()
    }
  }

  /** Paths staged (durable mode) by this process and not yet cleaned. */
  def stagedPaths: Set[String] = {
    import scala.jdk.CollectionConverters._
    staged.asScala.toSet
  }

  /** Delete every tracked staged directory. Call AFTER the run's
    * outputs are consumed or persisted — any DataFrame still reading a
    * staged path becomes invalid. Paths that fail to delete stay
    * tracked for a later attempt. */
  def cleanup(spark: org.apache.spark.sql.SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    staged.asScala.toSeq.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      if (scala.util.Try(path.getFileSystem(conf).delete(path, true)).isSuccess)
        staged.remove(p)
    }
  }
}
