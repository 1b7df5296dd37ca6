package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q203 k-center greedy coreset + q204 priority sampling — algorithm
  * invariants beyond the round-replaying DuckDB oracles. */
class SelectOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q203: greedy cover radius is non-increasing and picks are distinct") {
    val rows = SelectOps.q203KCenterCoreset.fn(spark, sf)
      .orderBy("round").collect()
    assert(rows.length == 6)
    assert(rows.head.getAs[Long]("maxmin") == 0L) // the seed round
    val radii = rows.tail.map(_.getAs[Long]("maxmin"))
    // farthest-point invariant: each round's max-min distance can only
    // shrink as centers accumulate
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
    assert(radii.forall(_ > 0))
    val picks = rows.map(_.getAs[Long]("vec_id"))
    assert(picks.distinct.length == picks.length)
  }

  test("q203: farthest-first traversal on a crafted corpus is the known sequence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kcenter").toString
    // collinear points: seed is id 0; the far end (id 1) goes next;
    // the midpoint (id 2) last. Quantization: 0.5 -> 500 on the lattice.
    Seq(
      (0L, Array(0f, 0f, 0f, 0f), 0),
      (1L, Array(0.5f, 0f, 0f, 0f), 0),
      (2L, Array(0.25f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SelectOps.q203KCenterCoreset.fn(spark, dir)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.take(3).toSeq == Seq(
      (1L, 0L, 0L),          // seed = min vec_id
      (2L, 1L, 500L * 500L), // farthest from the seed
      (3L, 2L, 250L * 250L)))// midpoint: min dist to either end
    // with the corpus exhausted, max-min collapses to 0 (every point
    // is a center) and the min-id tiebreak keeps the rounds defined
    assert(rows.drop(3).forall(_._3 == 0L))
  }

  test("q204: selection is exactly the top-K by priority; HT weights are floored at tau") {
    val out = SelectOps.q204PrioritySample.fn(spark, sf).collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == 20)
    // recompute the priority ranking independently
    val ranked = SelectOps.q204PlanProbe(spark, sf).collect()
    val expectIds = ranked.take(20).map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expectIds)
    val tau = ranked(20).getDouble(2)
    out.foreach { r =>
      assert(r.getAs[Double]("ht_weight") ==
        math.max(r.getAs[Long]("w").toDouble, tau))
      // every kept row outranks the threshold item
      assert(r.getAs[Double]("priority") >= tau)
    }
  }

  test("q204: the corpus-side plan is a driver-merged top-K — no sort, no exchange") {
    val p = SelectOps.q204PlanProbe(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange"))
  }

  test("q210: greedy gains are non-increasing and the trajectory replays from a driver-side integer greedy") {
    val out = SelectOps.q210SubmodularSelect.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === 8)
    assert(out.map(_._2).distinct.length === 8, "no doc picked twice")
    // submodularity: each later marginal can't beat an earlier one
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3 + 1e-12,
        s"gain must be non-increasing: round ${b._1} ${b._3} > ${a._3}")
    }
    // independent plain-Scala replay on the same lattice
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2.trim.nonEmpty)
    val tfs: Map[Long, Map[String, Long]] = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    }.toMap
    def q(x: Long): Long = math.floor(math.sqrt(x.toDouble) * 1e6 + 0.5).toLong
    val state = scala.collection.mutable.Map.empty[String, Long]
    val sel = scala.collection.mutable.Set.empty[Long]
    val expect = (1 to 8).map { r =>
      val (gain, did) = tfs.iterator.filterNot(kv => sel(kv._1)).map {
        case (id, tf) =>
          (tf.iterator.map { case (w, c) =>
            val cw = state.getOrElse(w, 0L); q(cw + c) - q(cw)
          }.sum, id)
      }.maxBy { case (g, id) => (g, -id) }
      tfs(did).foreach { case (w, c) =>
        state(w) = state.getOrElse(w, 0L) + c }
      sel += did
      (r, did, gain / 1e6)
    }
    assert(out.toSeq === expect, "lattice greedy must replay EXACTLY")
  }
}
