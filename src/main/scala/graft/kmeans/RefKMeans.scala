package graft.kmeans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorOps._

/** Reference-parity distributed K-Means: maximin ("farthest point")
  * seeding + Lloyd iterations, re-expressed Spark-first.
  *
  * Semantics pinned to the reference:
  *  - seeding: random first centroid (`main/master/master.go:160` — but
  *    seeded/deterministic here), then k−1 rounds each picking the point
  *    with the largest min-distance to the current centroid set, lowest-id
  *    tie-break (`master.go:157-190`, `main/worker/worker.go:106-129,271-285`).
  *    This is maximin, NOT MLlib's probabilistic k-means||.
  *  - Lloyd stop rule (`master.go:193-236`): delta = mean Euclidean
  *    centroid displacement (`master.go:569-576`); if delta <
  *    `deltaThreshold` stop BEFORE updating (reported centroids are the
  *    ones the final assignment used); if the iteration cap is hit the
  *    loop stops AFTER updating (centroids one step ahead of the last
  *    assignment — a reference quirk, `master.go:212-231`, reproduced).
  *  - empty clusters keep their previous centroid (`master.go:579-600`);
  *    unlike the reference, that path can't crash the shuffle
  *    (`master.go:398-404` panics on a gap in cluster ids).
  *
  * Physical plan per iteration — ONE Spark job:
  *   narrow map (argmin over literal centroids — the centroid broadcast of
  *   `master.go:313-333`) → hash aggregate with map-side partials (the
  *   combiner of `worker.go:169-189`) → shuffle of k×(d+1) values → k rows
  *   collected driver-side. The points DataFrame is cached once
  *   (`worker.go:53-59`'s chunk cache). Nothing O(N) ever reaches the
  *   driver, and membership is materialized once, post-convergence —
  *   fixing the reference's per-iteration member shipping
  *   (`structs.go:40`, `master.go:234`).
  */
object RefKMeans {

  /** @param firstId explicit first centroid row id (tests / reproducing the
    *                reference's "pick some row"); None → pseudo-random pick
    *                derived from `seed`. */
  final case class Config(
      k: Int,
      seed: Long = 42L,
      deltaThreshold: Double = 0.01,
      maxIter: Int = 100,
      firstId: Option[Long] = None,
      /** false → the reference's maximin seeding ([[seed]]); true → classic
        * D²-weighted k-means++ sampling ([[seedPP]]). */
      ppSeeding: Boolean = false,
      /** Pre-chosen seeds, bypassing both seeders (which run k−1
        * SEQUENTIAL corpus scans — see [[seed]]'s scale bound).
        * Partitioner use-cases (SemDeDup bucketing, IVF training) grow
        * k with the corpus and sample their seeds in ONE pass instead. */
      initialCentroids: Option[Array[Array[Double]]] = None)

  final case class Result(
      centroids: Array[(Int, Array[Double])],
      iterations: Int,
      finalDelta: Double,
      converged: Boolean)

  private def collectPoint(df: DataFrame): (Long, Array[Double]) = {
    val r = df.head()
    (r.getLong(0), r.getSeq[Double](1).toArray)
  }

  /** Maximin seeding (`master.go:157-190`). k driver-coordinated jobs,
    * each a narrow scan + top-1 (TakeOrderedAndProject = per-partition
    * top-1 partials, the reference's `initCombine` `worker.go:95-101`).
    *
    * SCALE BOUND: this is k−1 SEQUENTIAL full-corpus scans — the
    * reference's algorithm, and fine at the reference's k (≤10ish): at
    * k=8 on 100 TB that is 7 scans, each embarrassingly parallel. It
    * does NOT scale in k: k=1000 would serialize 1000 corpus scans.
    * The crossover ladder, all shipped here: [[seedPP]] (same one-job-
    * per-round shape, classic D² quality) → MLlib's k-means||
    * ([[MLlibKMeans]]: oversampling, O(log n) rounds independent of k)
    * for large k. On unambiguous well-separated data the three agree on
    * blob coverage (pinned by RefKMeansSpec's seeding-agreement
    * property test). */
  def seed(points: DataFrame, cfg: Config): Array[Array[Double]] = {
    val first = cfg.firstId match {
      case Some(id) => collectPoint(points.filter(col("id") === id))._2
      case None =>
        // Deterministic pseudo-random pick: min over a seeded hash of the
        // row id — one narrow top-1 pass, any partitioning.
        collectPoint(points
          .orderBy(xxhash64(col("id"), lit(cfg.seed)), col("id")).limit(1))._2
    }
    // ONE reused plan for all k−1 rounds: unfound slots hold sentinel
    // centroids at Double.MaxValue — their squared distance overflows to
    // +∞ and never wins the min, so filling slots in place is exactly
    // the growing-set semantics (same analyzed plan + codegen each round,
    // like the Lloyd loop below).
    val d = first.length
    val holder = Array.fill(cfg.k)(Array.fill(d)(Double.MaxValue))
    holder(0) = first.clone()
    val far = points
      .select(col("id"), col("features"),
        minDistK(col("features"), holder).as("sq"))
      .orderBy(desc("sq"), asc("id")).limit(1)
      .select(col("id"), col("features"))
    var found = 1
    while (found < cfg.k) {
      holder(found) = collectPoint(far)._2
      found += 1
    }
    holder
  }

  /** Classic D²-weighted k-means++ seeding (Arthur & Vassilvitskii 2007,
    * the algorithm the reference's maximin loop approximates
    * deterministically — `master.go:157-190` picks the argmax instead of
    * sampling ∝ D²). Made deterministic-distributed via an exponential
    * race: each row draws u ∈ (0,1) from a seeded per-(row, round) hash
    * and the next centroid is argmin of −ln(u)/D² — a weighted sample
    * taken as ONE distributed top-1 per round, nothing O(N) driver-side.
    * Already-chosen points have D² = 0 → key = +∞, never re-picked. */
  def seedPP(points: DataFrame, cfg: Config): Array[Array[Double]] = {
    val first = cfg.firstId match {
      case Some(id) => collectPoint(points.filter(col("id") === id))._2
      case None =>
        collectPoint(points
          .orderBy(xxhash64(col("id"), lit(cfg.seed)), col("id")).limit(1))._2
    }
    val d = first.length
    val holder = Array.fill(cfg.k)(Array.fill(d)(Double.MaxValue))
    holder(0) = first.clone()
    var found = 1
    while (found < cfg.k) {
      // u ∈ (0,1): pmod maps the hash into [0, MaxValue), +1 keeps ln(u)
      // finite and nonzero
      val u = (pmod(xxhash64(col("id"), lit(cfg.seed), lit(found.toLong)),
        lit(Long.MaxValue)) + lit(1L)).cast("double") /
        lit(Long.MaxValue.toDouble + 1.0)
      // argmax of D²/−ln(u) ≡ argmin of −ln(u)/D²; picked points score
      // D² = 0 and can't win. u < 1 mathematically, but a pmod result
      // within an ulp of Long.MaxValue can ROUND to u == 1.0 making
      // −ln(u) = 0 — the greatest() floor keeps ANSI mode from ever
      // seeing a zero divisor (the clamped key is astronomically large
      // but finite, preserving the argmax race)
      val key = minSqDistK(col("features"), holder) /
        greatest(-log(u), lit(1e-300))
      holder(found) = collectPoint(points
        .select(col("id"), col("features"), key.as("key"))
        .orderBy(desc("key"), asc("id")).limit(1)
        .select(col("id"), col("features")))._2
      found += 1
    }
    holder
  }

  /** Full fit: seeding + Lloyd loop. `points` must have columns
    * (id: LONG, features: ARRAY<DOUBLE>). */
  def fit(points0: DataFrame, cfg: Config): Result = {
    val points = points0.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val d = points.head().getSeq[Double](1).length
      var cents: Array[Array[Double]] = cfg.initialCentroids.getOrElse(
        if (cfg.ppSeeding) seedPP(points, cfg) else seed(points, cfg))
      require(cents.length == cfg.k,
        s"initialCentroids: ${cents.length} seeds for k=${cfg.k}")
      var iter = 0
      var delta = Double.MaxValue
      var converged = false

      // A FRESH Dataset per iteration, kernel centroids passed by value.
      // Reusing one Dataset across iterations (even with a mutable
      // centroid holder) is WRONG: the aggregation's shuffle-map stage
      // registers its outputs with the MapOutputTracker on the first
      // job, and every later collect() on the same RDD lineage SKIPS the
      // map stage and reuses the round-1 shuffle files — the loop
      // silently fixpoints after one real Lloyd round (caught by the
      // kmeans_fit_final oracle: the "converged" state moved by 0.07 on
      // replay). A new Dataset per round gives a new shuffle dependency,
      // so every round genuinely recomputes — while the kernel keeps the
      // compile-once win: centroid VALUES live in the expression object,
      // not the generated source, so the per-round plan produces
      // byte-identical codegen and Janino's cache hits (no per-iteration
      // ~0.5-1 s recompile — the cost that motivated the kernel).
      val aggs = count(lit(1)).as("n") +: (0 until d).map(i => sum(col("features").getItem(i)).as(s"s$i"))
      def iterDF(cs: Array[Array[Double]]) = points
        .select(nearestCidK(col("features"), cs).as("cid"), col("features"))
        .groupBy("cid")
        .agg(aggs.head, aggs.tail: _*)

      while (!converged && iter < cfg.maxIter) {
        // One job: argmin map → partial/final hash agg → k rows collected.
        val rows = iterDF(cents).collect()
        val byCid = rows.map { r =>
          val cid = r.getInt(0)
          val n = r.getLong(1)
          val mean = Array.tabulate(d)(i => r.getDouble(2 + i) / n)
          cid -> mean
        }.toMap
        // O15 empty-cluster carry-over (master.go:579-600).
        val newCents = Array.tabulate(cfg.k)(i => byCid.getOrElse(i, cents(i)))
        delta = cents.zip(newCents)
          .map { case (o, n) =>
            math.sqrt(o.zip(n).map { case (a, b) => (a - b) * (a - b) }.sum)
          }.sum / cfg.k
        iter += 1
        if (delta < cfg.deltaThreshold) {
          converged = true // stop BEFORE update: cents stay as assigned
        } else {
          cents = newCents // iteration-cap exit reports updated centroids
        }
      }
      Result(cents.zipWithIndex.map { case (c, i) => (i, c) }, iter, delta, converged)
    } finally points.unpersist()
  }

  /** Final membership — computed ONCE with the frozen centroids (drops the
    * reference's every-iteration member materialization, SURVEY.md §4). */
  def assign(points: DataFrame, centroids: Array[(Int, Array[Double])]): DataFrame =
    points.select(col("id"),
      nearestCidK(col("features"), centroids.sortBy(_._1).map(_._2)).as("cluster_id"))

  /** Fit + summarize: (cluster_id, n, centroid-as-long-format rows are in
    * [[centroidsDF]]); this is the client's result summary
    * (`main/client/client.go:208-234`). */
  def fitSizes(spark: SparkSession, points: DataFrame, cfg: Config): DataFrame = {
    val res = fit(points, cfg)
    assign(points, res.centroids)
      .groupBy("cluster_id").agg(count(lit(1)).as("n"))
      .orderBy("cluster_id")
  }

  def centroidsDF(spark: SparkSession, res: Result): DataFrame = {
    val rows = res.centroids.flatMap { case (cid, v) =>
      v.zipWithIndex.map { case (x, i) => (cid, i, x) }
    }.toSeq
    spark.createDataFrame(rows).toDF("cluster_id", "dim", "value")
  }
}
