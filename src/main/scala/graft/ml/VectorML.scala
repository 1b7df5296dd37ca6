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

  // ---------------------------------------------------------------
  // PCA / ZCA whitening (the SemDeDup & ANN preprocessing step)
  // ---------------------------------------------------------------

  /** Distributed mean + covariance of an `ARRAY<FLOAT>` column: the
    * corpus reduces to d + d(d+1)/2 accumulators (map-side combined —
    * the shuffle is d²-bounded whatever the row count), which is why
    * the result may come to the driver: d=64 → 32 KiB. Returns
    * (mu, full symmetric cov). */
  def covariance(e: DataFrame, embCol: String, d: Int): (Array[Double], Array[Array[Double]]) = {
    val v = e.select(col(embCol).cast("array<double>").as("v"))
    val n = v.count().toDouble
    val mu = new Array[Double](d)
    v.select(posexplode(col("v")).as(Seq("i0", "x")))
      .groupBy(col("i0")).agg(sum(col("x")).as("sx"))
      .collect().foreach(r => mu(r.getInt(0)) = r.getDouble(1) / n)
    val cov = Array.ofDim[Double](d, d)
    v.select(explode(expr(
        s"""flatten(transform(sequence(1, $d), i ->
           |  transform(sequence(i, $d), j ->
           |    struct(i, j, element_at(v, i) * element_at(v, j) as xy))))""".stripMargin))
        .as("p"))
      .select(col("p.i"), col("p.j"), col("p.xy"))
      .groupBy(col("i"), col("j")).agg(sum(col("xy")).as("sxy"))
      .collect().foreach { r =>
        val (i, j) = (r.getInt(0) - 1, r.getInt(1) - 1)
        val c = r.getDouble(2) / n - mu(i) * mu(j)
        cov(i)(j) = c; cov(j)(i) = c
      }
    (mu, cov)
  }

  /** Symmetric eigendecomposition by cyclic Jacobi rotations — plain
    * Scala over the DRIVER-SIZED d×d covariance (the corpus never
    * participates; Golub & Van Loan §8.5). Returns (eigenvalues,
    * eigenvectors as matrix columns), unordered. */
  def jacobiEigen(a0: Array[Array[Double]], sweeps: Int = 50,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val vMat = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > tol) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = vMat(k)(p); val vkq = vMat(k)(q)
            vMat(k)(p) = c * vkp - s * vkq
            vMat(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), vMat)
  }

  /** ZCA whitening: W = V Λ^(−1/2) Vᵀ over [[covariance]]'s matrix,
    * applied distributed as `white = W (v − mu)` with W and mu as
    * broadcast literals inside one codegen'd HOF — cov(white) = I
    * (proven in VectorMLSpec), the preprocessing that makes cosine/L2
    * geometry isotropic before SemDeDup or IVF training. `eps` floors
    * near-zero eigenvalues (degenerate dims stay at 0 variance rather
    * than exploding). Returns the frame with a `white` column plus
    * (mu, W) for introspection. */
  def zcaWhiten(e: DataFrame, embCol: String, d: Int, eps: Double = 1e-9)
      : (DataFrame, Array[Double], Array[Array[Double]]) = {
    val (mu, cov) = covariance(e, embCol, d)
    val (lam, vecs) = jacobiEigen(cov)
    // W = V diag(1/sqrt(lam)) V^T (symmetric, so rows == columns)
    val w = Array.tabulate(d, d) { (i, j) =>
      var acc = 0.0
      var k = 0
      while (k < d) {
        val l = lam(k)
        val inv = if (l > eps) 1.0 / math.sqrt(l) else 0.0
        acc += vecs(i)(k) * inv * vecs(j)(k)
        k += 1
      }
      acc
    }
    val wLit = typedLit(w.map(_.toSeq).toSeq)
    val muLit = typedLit(mu.toSeq)
    val centered = zip_with(col(embCol).cast("array<double>"), muLit, (x, m) => x - m)
    val whitened = e.withColumn("white",
      transform(wLit, row =>
        aggregate(zip_with(row, centered, (wv, xv) => wv * xv), lit(0.0), (acc, t) => acc + t)))
    (whitened, mu, w)
  }
}
