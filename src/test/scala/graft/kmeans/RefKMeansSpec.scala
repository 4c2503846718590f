package graft.kmeans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps

/** Golden micro-fixture tests (FIXTURES.md §A) pinning reference semantics:
  * maximin seeding (`/root/reference/main/master/master.go:157-190`),
  * first-index tie-breaks (`main/worker/worker.go:271-285,297-301`),
  * Lloyd stop rule incl. both exit paths (`master.go:212-231`),
  * empty-cluster carry-over (`master.go:579-600`). */
class RefKMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def pts(rows: (Long, Seq[Double])*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "features")
  }

  /** FIXTURES.md §A: two obvious blobs. */
  def blobs: DataFrame = pts(
    0L -> Seq(0.0, 0.0), 1L -> Seq(0.0, 1.0), 2L -> Seq(1.0, 0.0),
    3L -> Seq(10.0, 10.0), 4L -> Seq(10.0, 11.0), 5L -> Seq(11.0, 10.0))

  test("distance kernel matches hand values (utils/utils.go:46-54)") {
    val df = pts(0L -> Seq(0.0, 3.0)).select(
      VectorOps.dist(col("features"), array(lit(4.0), lit(0.0))).as("d"))
    assert(df.head().getDouble(0) === 5.0)
  }

  test("maximin seeding from id 0 picks (10,11) second (first-index tie-break)") {
    val cents = RefKMeans.seed(blobs, RefKMeans.Config(k = 2, firstId = Some(0L)))
    assert(cents(0).toSeq == Seq(0.0, 0.0))
    // ids 4 (10,11) and 5 (11,10) tie at dist sqrt(221); id 4 wins.
    assert(cents(1).toSeq == Seq(10.0, 11.0))
  }

  test("golden 2-blob fixture converges to exact centroids and membership") {
    val res = RefKMeans.fit(blobs, RefKMeans.Config(k = 2, firstId = Some(0L)))
    assert(res.converged)
    val cs = res.centroids.map(_._2.toSeq)
    assert(cs(0) == Seq(1.0 / 3, 1.0 / 3))
    assert(cs(1) == Seq(31.0 / 3, 31.0 / 3))
    val asg = RefKMeans.assign(blobs, res.centroids)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(asg.toSeq == Seq(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1))
  }

  test("assignment argmin breaks ties on lowest cluster id (worker.go:297-301)") {
    // point equidistant from both centroids
    val cid = pts(0L -> Seq(5.0, 5.0))
      .select(VectorOps.nearestCid(col("features"),
        Seq(0 -> Array(0.0, 0.0), 1 -> Array(10.0, 10.0))).as("cid"))
      .head().getInt(0)
    assert(cid === 0)
  }

  test("empty cluster keeps previous centroid (master.go:579-600)") {
    // k=2 but all points identical → second cluster gets no members after
    // the first update and must carry its seed centroid forward.
    val degenerate = pts(0L -> Seq(1.0, 1.0), 1L -> Seq(1.0, 1.0), 2L -> Seq(1.0, 1.0))
    val res = RefKMeans.fit(degenerate, RefKMeans.Config(k = 2, firstId = Some(0L)))
    assert(res.centroids(0)._2.toSeq == Seq(1.0, 1.0))
    assert(res.centroids(1)._2.toSeq == Seq(1.0, 1.0)) // seed carried
    assert(res.converged)
  }

  test("iteration cap exit reports centroids one update ahead (master.go:222-228 quirk)") {
    // maxIter=1 with far-apart blobs: delta after one update >= threshold,
    // so the loop exits on the cap with UPDATED centroids.
    val res = RefKMeans.fit(blobs, RefKMeans.Config(k = 2, firstId = Some(0L), maxIter = 1))
    assert(!res.converged && res.iterations == 1)
    // after one Lloyd step from seeds (0,0) and (10,11):
    // cluster0 = {0,1,2} → (1/3, 1/3); cluster1 = {3,4,5} → (31/3, 31/3)
    assert(res.centroids(0)._2.toSeq == Seq(1.0 / 3, 1.0 / 3))
    assert(res.centroids(1)._2.toSeq == Seq(31.0 / 3, 31.0 / 3))
  }

  test("reshape splits dims into contiguous averaged buckets (plotter.go:114-137)") {
    val out = pts(0L -> Seq(1.0, 3.0, 5.0, 7.0))
      .select(VectorOps.reshape(col("features"), 4, 2).as("r"))
      .head().getSeq[Double](0)
    assert(out == Seq(2.0, 6.0))
  }

  test("D² k-means++ seeding: deterministic, distinct data points, never re-picks") {
    val cfg = RefKMeans.Config(k = 3, seed = 7L, ppSeeding = true)
    val a = RefKMeans.seedPP(blobs, cfg).map(_.toSeq)
    val b = RefKMeans.seedPP(blobs, cfg).map(_.toSeq)
    assert(a.toSeq == b.toSeq, "same seed must reproduce the same centers")
    val data = blobs.collect().map(_.getSeq[Double](1).toSeq).toSet
    assert(a.forall(data.contains), "every seed must be an input point")
    assert(a.distinct.length == 3, "D²=0 points must never be re-sampled")
    // a different seed changes at least the sampled (non-first) picks
    val c = RefKMeans.seedPP(blobs, cfg.copy(seed = 8L)).map(_.toSeq)
    assert(a.toSeq != c.toSeq || a.head == c.head)
  }

  test("fit with pp seeding converges on the 2-blob fixture") {
    val res = RefKMeans.fit(blobs, RefKMeans.Config(k = 2, seed = 7L, ppSeeding = true))
    assert(res.converged)
    val sizes = RefKMeans.assign(blobs, res.centroids)
      .groupBy("cluster_id").count().collect().map(_.getLong(1)).sorted
    assert(sizes.sum == 6L)
  }

  test("seeding agreement: maximin, D²++, and large-k path cover the same blobs " +
      "when maximin is unambiguous (k <= 8)") {
    // k tight, far-separated blobs (spread 1e-9, separation ~1e3): the
    // maximin argmax is unambiguous, and seedPP's exponential race
    // cannot flip — a covered-blob point's key is bounded by
    // spread²·N/ln-floor, ~20 orders below an uncovered blob's
    // sep²/ln(N). The property the Scaladoc crossover ladder claims:
    // on unambiguous data all seeding strategies agree on BLOB COVERAGE
    // (one seed per blob), differing only in which member they pick.
    for (k <- Seq(2, 4, 8)) {
      val perBlob = 5
      val rows = for {
        b <- 0 until k
        i <- 0 until perBlob
      } yield ((b * perBlob + i).toLong,
        Seq(b * 1000.0 + i * 1e-9, (b % 3) * 1000.0 + i * 1e-9))
      val df = pts(rows: _*)
      def blobOf(v: Seq[Double]): Int = math.round(v.head / 1000.0).toInt
      val maximin = RefKMeans.seed(df, RefKMeans.Config(k = k, firstId = Some(0L)))
      val dpp = RefKMeans.seedPP(df, RefKMeans.Config(k = k, firstId = Some(0L),
        seed = 7L, ppSeeding = true))
      assert(maximin.map(c => blobOf(c.toSeq)).toSet == (0 until k).toSet,
        s"k=$k: maximin must place exactly one seed per blob")
      assert(dpp.map(c => blobOf(c.toSeq)).toSet == (0 until k).toSet,
        s"k=$k: D² seeding must place exactly one seed per blob")
      // the maximin pick inside each blob is the unambiguous argmax
      // (lowest id on ties) — pinned exactly, not just by coverage
      val data = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
      assert(maximin.forall(c => data.values.exists(_ == c.toSeq)),
        s"k=$k: every maximin seed must be an input point")
    }
  }

  test("concurrent fits on one session are deterministic and interference-free " +
      "(master.go:18-23,60-120)") {
    // the reference master serves concurrent clients from one process;
    // the Spark analogue is two fit jobs sharing one SparkSession on
    // parallel driver threads — results must be bit-identical to the
    // sequential runs (same plans, same partitioning, same fold order)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val sf = "/root/testdata/sf0.001"
    val ptsA = graft.sources.Tables.points(spark, sf)
    val ptsB = graft.sources.Tables.lineitemPointsStd(spark, sf)
    val cfgA = RefKMeans.Config(k = 4, firstId = Some(0L))
    val cfgB = RefKMeans.Config(k = 3, seed = 42L, maxIter = 10)
    def key(r: RefKMeans.Result): (Seq[(Int, Seq[Double])], Int, Double, Boolean) =
      (r.centroids.map { case (c, v) => (c, v.toSeq) }.toSeq, r.iterations,
        r.finalDelta, r.converged)
    val goldA = key(RefKMeans.fit(ptsA, cfgA))
    val goldB = key(RefKMeans.fit(ptsB, cfgB))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      for (_ <- 1 to 2) { // two rounds: concurrent churn, stable answers
        val fa = Future(key(RefKMeans.fit(ptsA, cfgA)))
        val fb = Future(key(RefKMeans.fit(ptsB, cfgB)))
        assert(Await.result(fa, 120.seconds) == goldA,
          "concurrent fit A diverged from its sequential result")
        assert(Await.result(fb, 120.seconds) == goldB,
          "concurrent fit B diverged from its sequential result")
      }
    } finally pool.shutdown()
  }
}
