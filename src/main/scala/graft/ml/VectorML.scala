package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib tier (BASELINE.json north star: "MLlib for
  * embedding/classification"): the production counterparts of the
  * deterministic oracle-path operators.
  *
  *  - `trainCentroids`: k-means replaces AnnOps' deterministic
  *    vec_id < C centroid pick for the IVF index build.
  *  - `LshIndex`: random-hyperplane bucketing (BucketedRandomProjectionLSH)
  *    as the approximate-similarity-join path — the alternative scale
  *    route to IVF for near-dup joins (SURVEY J4 "at scale").
  *  - `trainEmbeddingClassifier`: logistic regression over embedding
  *    vectors (document-routing/classification on learned features).
  *
  * All take the engine's `ARRAY<FLOAT>` columns and convert through
  * `array_to_vector` — no separate feature pipeline needed.
  */
object VectorML {

  private def withVec(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("__vec", array_to_vector(col(embCol)))

  /** K-means centroid training for the IVF index (seeded/deterministic). */
  def trainCentroids(embeddings: DataFrame, embCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(20).setFeaturesCol("__vec")
      .fit(withVec(embeddings, embCol))
    val rows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }
    embeddings.sparkSession.createDataFrame(rows.toSeq)
      .toDF("cid", "cv")
  }

  /** Assign every vector to its trained centroid (the IVF cell column). */
  def assignCells(embeddings: DataFrame, embCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    val vec = withVec(embeddings, embCol)
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(20).setFeaturesCol("__vec")
      .fit(vec)
    model.transform(vec)
      .withColumnRenamed("prediction", "cell")
      .drop("__vec")
  }

  /** Random-hyperplane LSH index over the embedding column. */
  final class LshIndex(df: DataFrame, embCol: String,
      bucketLength: Double = 0.5, numTables: Int = 3, seed: Long = 42L) {
    private val vecDf = withVec(df, embCol).cache()
    private val model = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables)
      .setSeed(seed).setInputCol("__vec").setOutputCol("__hashes")
      .fit(vecDf)

    /** Approximate top-k nearest neighbors of `query` (L2 metric). */
    def nearest(query: Seq[Float], k: Int): DataFrame = {
      val qv = org.apache.spark.ml.linalg.Vectors.dense(query.map(_.toDouble).toArray)
      model.approxNearestNeighbors(vecDf, qv, k).toDF()
        .withColumnRenamed("distCol", "l2_dist")
        .drop("__vec", "__hashes")
    }

    /** Approximate similarity self-join: candidate near-dup pairs within
      * `threshold` L2 distance — the LSH alternative to the label-blocked
      * exact join in DedupOps. */
    def neardupPairs(threshold: Double, idCol: String): DataFrame =
      model.approxSimilarityJoin(vecDf, vecDf, threshold, "l2_dist")
        .select(col(s"datasetA.$idCol").as("id_a"),
          col(s"datasetB.$idCol").as("id_b"), col("l2_dist"))
        .filter(col("id_a") < col("id_b"))
  }

  /** Logistic-regression classifier over embeddings (e.g. language or
    * topic routing on learned features). Returns the scored frame. */
  def trainEmbeddingClassifier(train: DataFrame, embCol: String,
      labelCol: String): DataFrame = {
    val vec = withVec(train, embCol)
    val model = new LogisticRegression()
      .setFeaturesCol("__vec").setLabelCol(labelCol)
      .setMaxIter(50).setRegParam(0.01)
      .fit(vec)
    model.transform(vec).drop("__vec", "rawPrediction", "probability")
  }
}
