package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1 (bench) —
  * and, unchanged, on a real cluster against s3a://…/sf1000.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Load + round-robin repartition to the cluster's parallelism.
    *
    * The driver test tables are single-row-group parquet files, which
    * Spark cannot split — a CPU-heavy narrow map (sha256 shingling,
    * regexp extraction) would otherwise run in ONE task. At production
    * scale inputs arrive as many files/row groups and scans parallelize
    * naturally; this is the local-mode equalizer for compute-bound map
    * stages. Don't use it before a plain agg/join — the extra shuffle
    * isn't paid back there.
    */
  def loadParallel(spark: SparkSession, dir: String, name: String): DataFrame =
    load(spark, dir, name).repartition(spark.sparkContext.defaultParallelism)

  /** events.parquet has shipped with two physical `ts` encodings across
    * testdata generations: parquet TIMESTAMP(NANOS) (which Spark cannot
    * read natively — [PARQUET_TYPE_ILLEGAL] — so we read nanos as Long
    * under the legacy flag and truncate to microseconds) and plain
    * timestamp[us] (readable directly). Branch on the READ schema, not an
    * assumption, so a driver-side regen of /root/testdata can never break
    * every downstream events query again.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // integer division: a double intermediate (ts/1000) only carries 53
        // mantissa bits and corrupts the microsecond digit at ~1.7e18 ns
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}

/** A registered engine query: Spark plan + (optionally) the equivalent
  * ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Column names and types MUST match between `fn`'s output and `oracle`
  * (the driver sorts columns by name and hashes values). Every query adds
  * a deterministic total ORDER BY (with a unique tiebreaker) on both
  * sides, and rounds any *computed* floating-point column; raw
  * passthrough doubles are left untouched (bit-identical in both
  * engines).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
