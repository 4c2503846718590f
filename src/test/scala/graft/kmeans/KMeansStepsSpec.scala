package graft.kmeans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the evaluation-step queries over sf0.001 (the
  * exact values are pinned by the DuckDB oracle at sf0.01; these pin the
  * mathematical shape). */
class KMeansStepsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("elbow: WCSS is non-increasing in k and consistent with wcss()") {
    val curve = KMeansSteps.elbow(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(curve.keySet == (1L to KMeansSteps.K).toSet)
    (2L to KMeansSteps.K).foreach { k =>
      assert(curve(k) <= curve(k - 1) + 1e-6,
        s"WCSS must not increase when a centroid is added (k=$k)")
    }
    // the k=K point of the curve equals the per-cluster wcss() total
    val total = KMeansSteps.wcss(spark, sf).collect().map(_.getDouble(1)).sum
    assert(math.abs(curve(KMeansSteps.K.toLong) - total) < 1e-4)
  }

  test("fitSteps: two Lloyd rounds, complete grid, sizes sum to N, loop progresses") {
    val rows = KMeansSteps.fitSteps(spark, sf, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val k = KMeansSteps.K
    val d = 64
    assert(rows.length == 2 * k * d, "one row per (iter, cluster, dim)")
    // the (iter, cid, dim) grid is complete — empty clusters carry, never vanish
    assert(rows.map(t => (t._1, t._2, t._3)).toSet ==
      (for (it <- 1L to 2L; c <- 0L until k; dm <- 0L until d) yield (it, c, dm)).toSet)
    val n = Tables_pointCount
    Seq(1L, 2L).foreach { it =>
      val sizes = rows.filter(t => t._1 == it && t._3 == 0L).map(_._4)
      assert(sizes.sum == n, s"iter $it cluster sizes must sum to N")
    }
    // iteration 2 must actually move at least one centroid coordinate
    val m1 = rows.filter(_._1 == 1L).map(t => (t._2, t._3) -> t._5).toMap
    val m2 = rows.filter(_._1 == 2L).map(t => (t._2, t._3) -> t._5).toMap
    assert(m1 != m2, "second Lloyd round must recenter")
    // deterministic: a second evaluation is bit-identical
    val again = KMeansSteps.fitSteps(spark, sf, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == again.toSeq)
  }

  private lazy val Tables_pointCount: Long =
    graft.sources.Tables.points(spark, sf).count()

  test("daviesBouldin: one positive ratio per cluster") {
    val rows = KMeansSteps.daviesBouldin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(rows.map(_._1).toSeq == (0L until KMeansSteps.K).toSeq)
    assert(rows.forall(_._2 > 0))
  }
}
