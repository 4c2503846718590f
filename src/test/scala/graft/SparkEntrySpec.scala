package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs and returns rows on sf0.001, and
  * every oracleSql key exists in queries (driver contract). */
class SparkEntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns non-empty") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name returns rows on sf0.001") {
      assert(fn(spark, sf).count() >= 0)
      // dedup/decontaminate may legitimately find nothing in a tiny corpus
      assert(fn(spark, sf).count() > 0 || name.startsWith("dedup")
        || name == "decontaminate", s"$name returned 0 rows")
    }
  }
}
