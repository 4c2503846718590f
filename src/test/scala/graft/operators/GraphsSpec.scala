package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the fixed-round PageRank (the exact values are pinned
  * by the DuckDB oracle at sf0.01). */
class GraphsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  test("pagerank conserves total mass and covers every lineitem node") {
    val all = Graphs.pageRank(spark, sf, topN = Int.MaxValue).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    val nParts = li.select("l_partkey").distinct().count()
    val nSupps = li.select("l_suppkey").distinct().count()
    assert(all.length == nParts + nSupps,
      "undirected bipartite graph: every part and supplier node ranks")
    // no dangling nodes -> total rank stays 1 (up to per-node rounding)
    val total = all.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-6, s"total rank $total")
    assert(all.forall(_.getDouble(1) > 0))
    // higher-degree nodes dominate the top of the ranking
    val topDeg = all.take(10).map(_.getLong(2)).min
    val medianDeg = all.map(_.getLong(2)).sorted.apply(all.length / 2)
    assert(topDeg >= medianDeg, "top-ranked nodes should not be low-degree")
  }

  test("pagerank is deterministic across evaluations") {
    def run() = Graphs.pageRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(run() == run())
  }
}
