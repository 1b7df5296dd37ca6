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

  /** GPT-3-style quality-classifier filter (GPT-3 appendix A; the
    * phi-family "textbook quality" filters are the same shape): hashed
    * bigram counts featurize documents — HashingTF's fixed-width trick,
    * the ML twin of q101's DSIR buckets — and a logistic regression
    * trained to tell a target ("high quality") corpus from the raw
    * pool scores any document with a target probability to threshold
    * on. Returns a scorer usable on any (doc_id, text) frame.
    *
    * Scale: featurization is a narrow map to fixed `numFeatures`-dim
    * sparse vectors; training is MLlib's distributed L-BFGS over them;
    * scoring is one broadcast-model map. No corpus self-join, and the
    * model is a single dense coefficient vector however big the
    * corpus. */
  def fitQualityFilter(raw: DataFrame, target: DataFrame,
      numFeatures: Int = 1024): DataFrame => DataFrame = {
    import org.apache.spark.ml.feature.HashingTF
    import org.apache.spark.ml.functions.vector_to_array
    def featurize(d: DataFrame): DataFrame =
      graft.operators.LmOps.tokenizedOf(d)
        .filter(size(col("w")) >= 2)
        .withColumn("__bgs", expr(
          """transform(sequence(1, size(w) - 1),
            |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))""".stripMargin))
    val tf = new HashingTF().setInputCol("__bgs").setOutputCol("__vec")
      .setNumFeatures(numFeatures)
    val trainDf = tf.transform(
      featurize(target).withColumn("label", lit(1.0))
        .unionByName(featurize(raw).withColumn("label", lit(0.0))))
    val model = new LogisticRegression()
      .setFeaturesCol("__vec").setLabelCol("label")
      .setMaxIter(50).setRegParam(0.01)
      .fit(trainDf)
    // score with the closed-form sigmoid over the extracted
    // coefficients: the returned scorer carries only plain doubles
    // (broadcast literals), not the model object — whose training
    // summary pins the SparkSession and breaks task serialization
    // when the scored frame is embedded in a larger (e.g. observed)
    // plan
    val coefs = model.coefficients.toArray.toSeq
    val intercept = model.intercept
    d => tf.transform(featurize(d))
      .withColumn("__arr", vector_to_array(col("__vec")))
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-(aggregate(
          zip_with(typedLit(coefs), col("__arr"), (c, x) => c * x),
          lit(intercept), (acc, t) => acc + t)))), 6).as("quality"))
  }
}
