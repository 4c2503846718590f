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

  test("query output schemas are compare-friendly (lower_snake, no duplicates)") {
    // the driver's compare sorts columns BY NAME before hashing — a
    // duplicate or non-snake name silently breaks the hash match
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, sf).schema
      val cols = schema.fieldNames.toSeq
      assert(cols.distinct.size == cols.size, s"$name has duplicate columns: $cols")
      cols.foreach(c => assert(c.matches("[a-z][a-z0-9_]*"),
        s"$name column '$c' is not lower_snake_case"))
      // FIXTURES.md hashed-output typing rule (r12): no DecimalType may
      // cross an output schema — the driver's hasher canonicalizes
      // DECIMAL values differently from the local DuckDB (the r11
      // 4-query breach; exact >int64 carriers ship as digit strings)
      val dec = OracleAudit.decimalFields(schema)
      assert(dec.isEmpty, s"$name emits DecimalType output: $dec")
    }
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name returns rows on sf0.001") {
      assert(fn(spark, sf).count() >= 0)
      // dedup/decontaminate may legitimately find nothing in a tiny
      // corpus; join_theta_sampled's %5 sample of the sf0.001 sides
      // leaves no qualifying theta pairs (25 rows at the sf0.01 gate)
      assert(fn(spark, sf).count() > 0 || name.startsWith("dedup")
        || name == "decontaminate" || name == "join_theta_sampled",
        s"$name returned 0 rows")
    }
  }
}
