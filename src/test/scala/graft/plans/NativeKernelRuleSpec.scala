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

  test("kernels reproduce HOF NULL semantics: null elements and ragged pairs") {
    // the rewrite fires on these nullable arrays, so the kernel must
    // return NULL exactly where the HOF would (ADVICE r2). Data stays
    // parquet-backed (literal VALUES would constant-fold into a
    // LocalRelation before the user-rule batch ever sees the HOF).
    def mangled = vecs.selectExpr(
      "vec_id",
      """CASE WHEN vec_id % 3 = 0
        |       THEN transform(v, (x, i) -> IF(i = 0, CAST(NULL AS DOUBLE), x))
        |     WHEN vec_id % 3 = 1 THEN slice(v, 1, size(v) - 1)
        |     ELSE v END AS a""".stripMargin,
      "v AS b")
      .selectExpr("vec_id",
        s"aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0.0D, (s, x) -> s + x) AS sq")
    assert(mangled.queryExecution.optimizedPlan.toString.contains("vec_sqdist"))
    def res(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val withRule = res(mangled)
    val noRule = {
      val prev = spark.experimental.extraOptimizations
      spark.experimental.extraOptimizations = Nil
      try res(mangled) finally spark.experimental.extraOptimizations = prev
    }
    assert(withRule == noRule)
    // every third row has a null element, next third is ragged → NULL
    assert(withRule.collect { case (id, None) => id % 3 }.toSet == Set(0L, 1L))
    assert(withRule.exists { case (id, v) => id % 3 == 2 && v.isDefined })
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
