package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.kmeans.KMeansSteps
import graft.sources.Tables

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k (the exact baseline) and an IVF-style coarse-quantized variant
  * (the scale path). Extends the reference's surface per the build
  * contract; the distance kernel is the reference's
  * (`/root/reference/utils/utils.go:46-54`) generalized to cosine.
  */
object Similarity {

  /** (vec_id, v, nrm): norm precomputed once per row so every pairwise
    * score is a single dot-product kernel (cos = dot/(nrmA·nrmB), same
    * arithmetic as cosine() bit-for-bit). */
  private def points(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), col("v"), l2norm(col("v")).as("nrm"))

  /** Exact brute-force cosine top-k: the tiny query set is broadcast
    * against the full corpus (one narrow pass over N), then per-query
    * top-k. At 1000 executors this is the right plan for small query
    * batches: no shuffle of the corpus, only q×N scored rows reduced to
    * q×k. */
  def bruteTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val p = points(spark, sfDir)
    val q = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = p.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("n_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }

  /** IVF-style ANN: corpus is coarse-quantized to the literal centroid
    * set (Euclidean argmin — [[KMeansSteps]] assignment); each query
    * probes its `nprobe` nearest buckets and scores only those members.
    * Deterministic (fixed centroids) → oracle-reproducible. At scale the
    * corpus is written bucket-partitioned so a probe is a partition-pruned
    * scan of nprobe/nlist of the data. */
  def ivfTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 10, k: Int = 5, nprobe: Int = 2): DataFrame = {
    val cs = KMeansSteps.centroids(spark, sfDir) // nlist = 8 literal centroids
    val p = points(spark, sfDir)
    val bucketed = p.select(col("vec_id"), col("v"), col("nrm"),
      nearestCidK(col("v"), cs.sortBy(_._1).map(_._2).toArray).as("bucket"))
    // per-query probed buckets: nprobe nearest centroids (dist, cid order)
    val q = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val probes = q.select(col("q_id"), col("qv"), col("qnrm"),
        posexplode(transform(centroidsLit(cs), c =>
          struct(sqDist(col("qv"), c.getField("c")).as("d"), c.getField("cid").as("cid"))))
          .as(Seq("i", "dc")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dc.d"), col("dc.cid"))))
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("qv"), col("qnrm"), col("dc.cid").as("bucket"))
    val scored = bucketed.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("n_id"), round(col("cos"), 6).as("cos"))
      .orderBy("q_id", "rank")
  }
}
