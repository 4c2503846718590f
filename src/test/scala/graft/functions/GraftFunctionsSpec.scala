package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registered native vector kernels. */
class GraftFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("vec_dot / vec_sqdist / vec_dist usable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       vec_sqdist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS sq,
        |       vec_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS dist""".stripMargin)
      .head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 25.0)
    assert(r.getDouble(2) === 5.0)
  }

  test("kernels match the HOF-equivalent on table data") {
    import org.apache.spark.sql.functions._
    GraftFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.createOrReplaceTempView("e_vecs")
    val native = spark.sql(
      "SELECT sum(vec_sqdist(v, v)) FROM e_vecs").head().getDouble(0)
    val hof = e.select(sum(aggregate(zip_with(col("v"), col("v"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x))).head().getDouble(0)
    assert(native === hof)
  }
}
