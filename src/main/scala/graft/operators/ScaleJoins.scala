package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-control utilities for the 100 TB design (SCALE.md):
  * bucketed co-located joins and skew salting. These are the concrete
  * implementations behind the scale notes — each verified by plan
  * inspection in ScaleJoinsSpec.
  */
object ScaleJoins {

  /** Write both sides bucketed+sorted on the join key so the join plans
    * as a zero-exchange sort-merge (the history/chunk-table strategy:
    * pay the shuffle once at write, never per query). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted join for skewed keys: the hot side's key is split into
    * `salt` sub-keys; the dimension side is exploded `salt`-fold so
    * every sub-key finds its row. AQE's skew-join handles moderate skew
    * automatically — explicit salting is for the pathological keys the
    * runtime splitter can't fix (one key >> one partition). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int, saltCols: Seq[String] = Nil): DataFrame = {
    // salt must be DETERMINISTIC per row: it becomes a shuffle join key,
    // and a task retry that re-derives different salts than already-
    // fetched map output would duplicate/drop rows. Default salt source =
    // all non-map columns (hash() rejects MapType under the default
    // spark.sql.legacy.allowHashOnMapType=false). Identical duplicate
    // rows hash to the same salt, so duplicate-row skew is NOT spread —
    // callers with such data must pass distinguishing saltCols (e.g. a
    // line-number or offset column).
    val src =
      if (saltCols.nonEmpty) saltCols
      else fact.schema.fields
        .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
        .map(_.name).toSeq
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(src.map(col): _*), lit(salt)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
