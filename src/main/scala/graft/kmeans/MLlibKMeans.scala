package graft.kmeans

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib k-means path — the scale/bench alternative engine
  * (BASELINE.json "spark_approach"). NOT semantics-identical to the
  * reference ([[RefKMeans]] is the parity surface): `k-means||`
  * probabilistic seeding vs maximin (`main/master/master.go:157-190`),
  * per-centroid squared-movement tolerance vs mean displacement
  * (`master.go:569-576`). Deterministic under a fixed seed, so it is a
  * valid rows-only query; never the DuckDB-oracle target.
  */
object MLlibKMeans {

  def fitPredictions(spark: SparkSession, points: DataFrame,
      k: Int, seed: Long = 42L, maxIter: Int = 100): DataFrame = {
    val vecs = points.select(col("id"),
      array_to_vector(col("features")).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(vecs)
    model.transform(vecs).select(col("id"), col("cluster_id"))
  }

  /** Cluster sizes via the MLlib fit — bench twin of
    * [[RefKMeans.fitSizes]]. */
  def fitSizes(spark: SparkSession, sfDir: String, k: Int = 8): DataFrame = {
    val pts = graft.sources.Tables.points(spark, sfDir)
    // tol-based early stop usually fires well before this cap; the cap
    // only bounds the pathological case
    fitPredictions(spark, pts, k, maxIter = 30)
      .groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .select(col("cluster_id").cast("long").as("cluster_id"), col("n"))
      .orderBy("cluster_id")
  }

  /** Trained cluster centers as (cid, coords) — same shape as
    * [[RefKMeans.Result.centroids]], for the frozen-state oracle
    * (`kmeans_mllib_final`): the TRAINING stays MLlib's (probabilistic
    * seeding, never SQL-replayed), but scoring the frozen model —
    * assignment, sizes, WCSS — is deterministic arithmetic that DuckDB
    * verifies from the literals. Config matches [[fitSizes]]. */
  def trainedCenters(spark: SparkSession, sfDir: String,
      k: Int = 8, seed: Long = 42L, maxIter: Int = 30): Array[(Int, Array[Double])] = {
    val vecs = graft.sources.Tables.points(spark, sfDir).select(col("id"),
      array_to_vector(col("features")).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cluster_id")
      .fit(vecs)
    model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }
  }
}
