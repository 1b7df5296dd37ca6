package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.expressions.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor over the embeddings table: IVF
  * (inverted-file) search — the scale path behind RetrievalOps'
  * brute-force top-k.
  *
  * Index build: pick C centroids (deterministic here: vec_id < C; k-means
  * at scale), assign every vector to its nearest centroid — a narrow map
  * over a broadcast centroid table, materialized partitioned-by-cell.
  * Query: score the C centroids (driver-sized), probe the `nprobe`
  * nearest cells, exact-rank only those candidates: the scored set drops
  * from N to ~N·nprobe/C, and the cell partitioning prunes the scan.
  */
object AnnOps {

  private val C = 16       // centroid count
  private val NProbe = 4   // cells probed per query

  val q56AnnIvf: QueryDef = QueryDef(
    "q56_ann_ivf",
    (s, dir) => {
      VectorExpressions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val centroids = e.filter(col("vec_id") < C)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      // assignment: nearest centroid per vector (broadcast C, narrow map)
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("dist"), col("cid"))
      val assigned = e.crossJoin(broadcast(centroids))
        .select(col("vec_id"), col("embedding"), col("cid"),
          expr("l2_sq_f(embedding, cv)").as("dist"))
        .withColumn("rk", row_number().over(wAssign))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
      // query: probe the NProbe nearest cells to the query vector
      val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      // nearest-NProbe cells: orderBy+limit (TakeOrdered) — the probe set
      // is just the cell ids, no rank column needed, no window at all
      val probed = centroids.crossJoin(broadcast(qv))
        .select(col("cid"), expr("l2_sq_f(cv, qv)").as("qdist"))
        .orderBy(col("qdist"), col("cid"))
        .limit(NProbe)
        .select(col("cid").as("cell"))
      // exact rank within probed cells only
      assigned.join(broadcast(probed), "cell")
        .crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= 0)
        .select(col("cell"), col("vec_id"),
          round(expr("dot_product_f(embedding, qv)"), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $C),
      assigned AS (SELECT vec_id, v, cid AS cell FROM (
        SELECT e.vec_id, e.v, c.cid,
          row_number() OVER (PARTITION BY e.vec_id ORDER BY
            list_sum(list_transform(list_zip(e.v, c.cv), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rk
        FROM e, cent c) a WHERE rk = 1),
      q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      probed AS (SELECT cid AS cell FROM (
        SELECT c.cid, row_number() OVER (ORDER BY
          list_sum(list_transform(list_zip(c.cv, q.qv), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS prk
        FROM cent c, q) p WHERE prk <= $NProbe)
      SELECT cell, vec_id,
        round(list_sum(list_transform(list_zip(a.v, q.qv), x -> x[1]*x[2])), 6) AS score
      FROM assigned a JOIN probed USING (cell), q
      WHERE vec_id <> 0
      ORDER BY score DESC, vec_id LIMIT 5"""),
    headline = true)

  private val LshBits = 4  // hyperplanes → 2⁴ buckets

  /** LSH-bucketed ANN — the other scale path next to IVF: each vector
    * gets a sign-bit bucket from `LshBits` fixed hyperplanes (here the
    * deterministic basis differences v[2i] − v[2i+1]; random Gaussian
    * planes at scale), the query joins only its own bucket, and exact
    * scoring runs on that ~N/2^bits slice. Written `partitionBy(bucket)`
    * the probe is partition-pruned I/O, same as the IVF cell layout;
    * multi-probe (Hamming-1 neighbors) is the recall knob. */
  val q68AnnLsh: QueryDef = QueryDef(
    "q68_ann_lsh",
    (s, dir) => {
      VectorExpressions.register(s)
      val bucketExpr = (0 until LshBits).map(i =>
        s"case when element_at(embedding, ${2 * i + 1}) >= element_at(embedding, ${2 * i + 2}) then '1' else '0' end")
        .mkString("concat(", ", ", ")")
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .withColumn("bucket", expr(bucketExpr))
      val qb = e.filter(col("vec_id") === 0)
        .select(col("bucket"), col("embedding").as("qv"))
      e.join(broadcast(qb), "bucket")
        .filter(col("vec_id") =!= 0)
        .select(col("bucket"), col("vec_id"),
          round(expr("dot_product_f(embedding, qv)"), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(5)
    },
    Some({
      val bucketSql = (0 until LshBits).map(i =>
        s"CASE WHEN v[${2 * i + 1}] >= v[${2 * i + 2}] THEN '1' ELSE '0' END")
        .mkString(" || ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
          $bucketSql AS bucket FROM embeddings),
        q AS (SELECT bucket, v AS qv FROM e WHERE vec_id = 0)
        SELECT e.bucket, vec_id,
          round(list_sum(list_transform(list_zip(e.v, q.qv), x -> x[1]*x[2])), 6) AS score
        FROM e JOIN q USING (bucket)
        WHERE vec_id <> 0
        ORDER BY score DESC, vec_id LIMIT 5"""
    }))

  val all: Seq[QueryDef] = Seq(q56AnnIvf, q68AnnLsh)
}
