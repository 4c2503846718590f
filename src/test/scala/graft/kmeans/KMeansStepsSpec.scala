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

  test("daviesBouldin: one positive ratio per cluster") {
    val rows = KMeansSteps.daviesBouldin(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(rows.map(_._1).toSeq == (0L until KMeansSteps.K).toSeq)
    assert(rows.forall(_._2 > 0))
  }
}
