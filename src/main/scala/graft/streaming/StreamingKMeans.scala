package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._

/** Streaming (mini-batch) K-Means: each micro-batch refines the running
  * centroids with a count-weighted update — the streaming flavor of
  * [[graft.kmeans.RefKMeans]]'s Lloyd step (assignment kernel and
  * per-cluster sum are the same operators; `master.go:193-236`'s loop
  * becomes the micro-batch cadence).
  *
  * State is k×(d+1) doubles on the driver (centroids + weights) — the
  * same tiny payload the batch fit collects per iteration; each batch is
  * one narrow map + one k-row aggregate, so the update scales exactly
  * like a Lloyd iteration. Deterministic for a fixed file order.
  */
class StreamingKMeans(k: Int, d: Int, decay: Double = 1.0) {

  /** (centroid, weight) per cluster; initialized lazily from the first
    * batch's first k rows (the streaming analog of seed-by-sample). */
  @volatile var centroids: Array[Array[Double]] = Array.empty
  private var weights: Array[Double] = Array.fill(k)(0.0)

  def isInitialized: Boolean = centroids.nonEmpty

  /** One mini-batch update: assign with the current centroids, aggregate
    * per-cluster (count, sum), then merge count-weighted:
    * c' = (w·decay·c + Σx) / (w·decay + n), w' = w·decay + n. */
  def update(batch: DataFrame): Unit = {
    if (batch.isEmpty) return
    if (!isInitialized) {
      centroids = batch.select(col("features")).limit(k).collect()
        .map(_.getSeq[Double](0).toArray)
      if (centroids.length < k) { // degenerate first batch: pad by repeat
        centroids = Array.tabulate(k)(i => centroids(i % centroids.length).clone())
      }
    }
    val aggs = count(lit(1)).as("n") +:
      (0 until d).map(i => sum(col("features").getItem(i)).as(s"s$i"))
    val rows = batch
      .select(nearestCidK(col("features"), centroids).as("cid"), col("features"))
      .groupBy("cid").agg(aggs.head, aggs.tail: _*)
      .collect()
    rows.foreach { r =>
      val cid = r.getInt(0)
      val n = r.getLong(1).toDouble
      val w = weights(cid) * decay
      val c = centroids(cid)
      var i = 0
      while (i < d) {
        c(i) = (w * c(i) + r.getDouble(2 + i)) / (w + n)
        i += 1
      }
      weights(cid) = w + n
    }
  }

  /** Attach to a (streaming) points frame: every micro-batch refines the
    * model. Caller starts/stops the returned query. */
  def fitStream(points: DataFrame): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    points.writeStream.outputMode("append")
      .foreachBatch((batch: DataFrame, _: Long) => update(batch))

  /** Final assignment of a static frame with the learned centroids. */
  def transform(points: DataFrame): DataFrame =
    points.select(col("id"), nearestCidK(col("features"), centroids).as("cluster_id"))
}
