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
  */
object Staging {
  def materialize(df: DataFrame, tag: String, confKey: String): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(confKey) match {
      case Some(root) =>
        val path = s"$root/${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
        df.write.mode("overwrite").parquet(path)
        s.read.parquet(path)
      case None => df.localCheckpoint()
    }
  }
}
