package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HOF→native-kernel rewrite: fires on the canonical patterns,
  * leaves everything else alone, never changes results. */
class NativeKernelRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ NativeKernelRule
    s
  }

  private def vecs = {
    import spark.implicits._
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  private val sqDistHof =
    "aggregate(zip_with(v, reverse(v), (x, y) -> (x - y) * (x - y)), 0.0D, (s, x) -> s + x)"
  private val dotHof =
    "aggregate(zip_with(v, reverse(v), (x, y) -> x * y), 0.0D, (s, x) -> s + x)"

  test("squared-distance and dot HOF patterns rewrite to the kernels") {
    val df = vecs.selectExpr(s"$sqDistHof AS sq", s"$dotHof AS dp")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("vec_sqdist") && opt.contains("vec_dot"),
      "kernels absent from optimized plan:\n" + opt)
    assert(!opt.contains("aggregate("), "HOF survived the rewrite:\n" + opt)
  }

  test("rewrite is bit-identical to the unoptimized HOF result") {
    val withRule = vecs.selectExpr("vec_id", s"$sqDistHof AS sq")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val noRule = {
      val prev = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations = Nil
      try vecs.selectExpr("vec_id", s"$sqDistHof AS sq")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally spark.experimental.extraOptimizations = prev
    }
    assert(withRule == noRule)
  }

  test("non-matching folds are left untouched") {
    // abs-difference fold is NOT a known kernel — must survive as a HOF
    val df = vecs.selectExpr(
      "aggregate(zip_with(v, reverse(v), (x, y) -> abs(x - y)), 0.0D, (s, x) -> s + x) AS l1")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("aggregate("), opt)
    assert(!opt.contains("vec_sqdist"), opt)
  }
}
