package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational diagnostics over shuffle keys: the reports an engine
  * operator (or its operator) reads BEFORE choosing salting, AQE skew
  * thresholds, or bucketing counts. These are first-class queries, not
  * logging — the same audit that decides "does this key need a salt"
  * at 100 TB runs oracle-checked here.
  */
object DiagnosticsOps {

  /** Top-N heaviest values of a prospective shuffle key, with each
    * key's share of all rows and the cumulative concentration curve.
    * A top-1 share near 1/numPartitions is harmless; a top-1 share of
    * 0.3 means one straggler task — salt or raise the AQE skew factor.
    *
    * Scale: the per-key count is the ordinary aggregate the eventual
    * shuffle would run anyway; the top-N cut is TakeOrdered (no global
    * sort of the key table); rank and cumulative sum run on the N-row
    * result only. The total is one scalar broadcast back. All counts
    * integer; shares are single long/long divisions, so the oracle is
    * parity-exact. */
  def skewAudit(df: DataFrame, key: Column, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(col("n").desc, col("key")).limit(topN)
    val w = Window.orderBy(col("n").desc, col("key"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("total"), 6))
      .withColumn("cum_share", round(col("cum_n") / col("total"), 6))
      .select(col("rank"), col("key"), col("n"), col("share"), col("cum_share"))
      .orderBy(col("rank"))
  }

  /** q142: the skew audit over the events stream's natural shuffle key
    * (user_id) — the exact frame consulted before keying sessionize /
    * funnel / retention work at scale. */
  val q142SkewAudit: QueryDef = QueryDef(
    "q142_skew_audit",
    (s, dir) => skewAudit(Tables.load(s, dir, "events"), col("user_id"))
      .withColumnRenamed("key", "user_id"),
    Some("""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
      top AS (SELECT * FROM c ORDER BY n DESC, user_id LIMIT 20),
      r AS (SELECT user_id, n,
        CAST(row_number() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rank,
        CAST(sum(n) OVER (ORDER BY n DESC, user_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
        FROM top)
      SELECT rank, user_id, n,
        round(n / total, 6) AS share,
        round(cum_n / total, 6) AS cum_share
      FROM r, t ORDER BY rank"""))

  val all: Seq[QueryDef] = Seq(q142SkewAudit)
}
