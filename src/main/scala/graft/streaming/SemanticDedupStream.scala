package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.VectorOps

/** Online SemDeDup: streaming semantic dedup of an embedding stream —
  * the incremental twin of [[graft.operators.Dedup.semanticDedup]]
  * (reference analogue: the chunk-accumulating ingest session of
  * `main/master/master.go:60-96`, upgraded with real dedup state).
  *
  * Each arrival is bucketed by its nearest frozen centroid (the batch
  * operator's partitioner — identical kernel, identical tie-break); per
  * bucket, `flatMapGroupsWithState` holds the survivor list and a new
  * vector is emitted (and stored) only when its cosine to EVERY stored
  * survivor is under the threshold. Greedy ARRIVAL-order semantics,
  * deterministic given the slicing: events process batch-by-batch, in
  * vec_id order within each micro-batch, so the kept set equals a batch
  * greedy replay of exactly that sequence (parity-tested bit-for-bit
  * for both contiguous and round-robin slicings). Slicing-INdependence
  * holds only for id-order-preserving slicings (every id in batch i+1
  * greater than every id in batch i): an out-of-order source that
  * delivers a smaller id in a later batch yields the replay of that
  * arrival order, not of global id order — the same contract as any
  * online greedy dedup.
  *
  * Scale posture: state is one survivor list per bucket, bounded by
  * `capacity` (0 = unbounded); at the cap the OLDEST survivor is
  * evicted (FIFO), degrading gracefully to a sliding dedup horizon —
  * the same contract as watermarked `dropDuplicates`. At 100 TB the
  * deployment is capacity ≈ the dedup working set per bucket with k
  * grown ∝ corpus (buckets stay small), plus periodic batch
  * [[graft.operators.Dedup.semanticDedupScaled]] compaction. */
object SemanticDedupStream {

  case class Arrival(vec_id: Long, features: Seq[Double], cid: Int)
  case class Kept(vec_id: Long, cid: Int)
  case class BucketState(kept: List[(Long, Seq[Double])])

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** `arrivals` must provide (vec_id LONG, features castable to
    * ARRAY<DOUBLE>); returns the survivors as they are admitted. */
  def dedupStream(spark: SparkSession, arrivals: DataFrame,
      centroids: Array[Array[Double]], threshold: Double = 0.4,
      capacity: Int = 0): Dataset[Kept] = {
    import spark.implicits._
    val typed = arrivals
      .select(col("vec_id"),
        col("features").cast("array<double>").as("features"))
      .withColumn("cid", VectorOps.nearestCidK(col("features"), centroids))
      .as[Arrival]

    def update(cid: Int, evs: Iterator[Arrival],
        state: GroupState[BucketState]): Iterator[Kept] = {
      // newest-first list: O(1) admit, FIFO eviction drops the tail
      var kept = state.getOption.map(_.kept).getOrElse(Nil)
      val out = List.newBuilder[Kept]
      evs.toSeq.sortBy(_.vec_id).foreach { a =>
        val v = a.features.toArray
        val dup = kept.exists { case (_, u) => cos(v, u.toArray) >= threshold }
        if (!dup) {
          out += Kept(a.vec_id, a.cid)
          kept = (a.vec_id, a.features) :: kept
          if (capacity > 0 && kept.length > capacity)
            kept = kept.take(capacity)
        }
      }
      state.update(BucketState(kept))
      out.result().iterator
    }

    typed.groupByKey(_.cid)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** The batch greedy replay the stream must equal: survivors of
    * processing `points` — in vec_id order by default (the id-ordered
    * ingest contract), or in the EXACT sequence given when
    * `sortById = false` (to replay an arbitrary arrival order, e.g. a
    * non-id-ordered micro-batch slicing). Driver-side, test/oracle use
    * — the distributed set-level operator is
    * [[graft.operators.Dedup.semanticDedup]]. */
  def greedyReplay(points: Seq[(Long, Array[Double])],
      centroids: Array[Array[Double]], threshold: Double = 0.4,
      capacity: Int = 0, sortById: Boolean = true): Seq[Kept] = {
    def nearestCid(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < centroids.length) {
        val w = centroids(c); var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - w(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val byBucket = scala.collection.mutable.Map
      .empty[Int, List[(Long, Array[Double])]]
    val out = Seq.newBuilder[Kept]
    (if (sortById) points.sortBy(_._1) else points).foreach { case (id, v) =>
      val cid = nearestCid(v)
      val kept = byBucket.getOrElse(cid, Nil)
      if (!kept.exists { case (_, u) => cos(v, u) >= threshold }) {
        out += Kept(id, cid)
        val grown = (id, v) :: kept
        byBucket(cid) =
          if (capacity > 0 && grown.length > capacity) grown.take(capacity)
          else grown
      }
    }
    out.result()
  }
}
