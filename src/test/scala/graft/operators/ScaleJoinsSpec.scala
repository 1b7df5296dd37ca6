package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSpec {

  test("bucketed tables join without an exchange on the fact side") {
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .select("o_orderkey", "o_totalprice")
    ScaleJoins.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    ScaleJoins.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "o_bucketed", "l_orderkey", 4)
    try {
      // disable broadcast so the join strategy is genuinely sort-merge
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), "l_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(400))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == li.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the executed plan)") {
    // the SCALE.md claim "AQE skew-split for hot keys", executed: one
    // key carries ~1000x the rows of the others, thresholds lowered to
    // test scale, and the post-execution adaptive plan must mark the
    // sort-merge join as skew-handled
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.5",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // per-row unique padding: shuffle sizes are COMPRESSED bytes, so
      // a constant pad would deflate below the skew threshold
      val pad = expr("repeat(sha2(cast(id as string), 256), 8)")
      // hot side: 50k rows of key 0 (+ a long tail), well past 64KB
      val fact = spark.range(0, 50000).select(lit(0L).as("k"), pad.as("p"))
        .unionByName(spark.range(1, 200).select(col("id").as("k"), pad.as("p")))
      val dim = spark.range(0, 200).select(col("id").as("k"), lit(1).as("v"))
      val joined = fact.join(dim, "k")
      // execute THIS plan (count() would run a different query and the
      // adaptive plan under inspection would never finalize)
      assert(joined.collect().length === 50000 + 199)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(1200)}")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("partition-layout fact scan is dynamically pruned by a selective dim filter") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    graft.Tables.load(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    // the dim must be a real table: a literal LocalRelation pre-folds
    // its filter away and DPP sees no selective predicate to reuse
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("R", "returned"), ("N", "none"), ("A", "accepted"))
      .toDF("l_returnflag", "meaning").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim.filter(col("meaning") === "returned"), "l_returnflag")
    val n = joined.count()
    // only the R partition's rows flow
    val expected = fact.filter(col("l_returnflag") === "R").count()
    assert(n === expected)
    // the scan carries a runtime pruning predicate — at 100 TB this is
    // the difference between reading one partition and reading them all
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in:\n${plan.take(1000)}")
  }

  test("salted join yields the same result as the plain join") {
    import spark.implicits._
    // hot key: 90% of fact rows share key 1
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i))
      .toDF("k", "v")
    val dim = (0L to 6L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val plain = fact.join(dim, "k")
    val salted = ScaleJoins.saltedJoin(fact, dim, "k", salt = 8)
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").count().orderBy("k").collect().map(_.toString)
    val b = plain.groupBy("k").count().orderBy("k").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
    // the hot key's rows spread across multiple salt partitions pre-join
    val spread = fact.withColumn("__salt",
        pmod(hash(monotonically_increasing_id()), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(spread > 1, s"salting failed to split the hot key (spread=$spread)")
  }
}
