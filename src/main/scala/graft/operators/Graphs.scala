package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Iterative graph analytics on DataFrames — the capability class the
  * reference's MapReduce loop (seed → iterate → converge,
  * `main/master/master.go:193-236`) generalizes to beyond k-means.
  *
  * The graph is the part↔supplier co-occurrence bipartite graph of
  * `lineitem` (distinct edges, both directions, so no dangling nodes).
  * PageRank runs a FIXED number of rounds with each round's ranks
  * rounded to 12 decimals in both engines — the same rounded-fixpoint
  * contract as [[graft.kmeans.KMeansSteps.fitSteps]] (FIXTURES.md §C),
  * which is what makes an iterative computation DuckDB-replayable.
  *
  * Scale shape: each round is ONE join of the rank relation to the edge
  * list (both shuffle on the node key — co-partitioned across rounds)
  * plus ONE aggregate; no adjacency ever materializes driver-side, and
  * the rank relation is node-sized, never edge-sized. The classic
  * message-passing round of every BSP/Pregel system, expressed as
  * joins Catalyst can plan.
  */
object Graphs {

  /** Distinct undirected (both-direction) edges: part nodes are even
    * ids (2·partkey), supplier nodes odd (2·suppkey + 1). */
  private def edges(spark: SparkSession, sfDir: String): DataFrame = {
    val e0 = Tables(spark, sfDir, "lineitem")
      .select((col("l_partkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    e0.unionByName(e0.select(col("b").as("a"), col("a").as("b")))
  }

  /** PageRank after exactly `iters` rounds (damping 0.85, uniform
    * 1/N init), top `topN` nodes by final rounded rank. Output:
    * (node, rank, degree). */
  def pageRank(spark: SparkSession, sfDir: String,
      iters: Int = 2, topN: Int = 20): DataFrame = {
    val e = edges(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = e.groupBy("a").agg(count(lit(1)).as("d"))
      val n = deg.count() // every node has degree ≥ 1 (both directions)
      var ranks = deg.select(col("a").as("v"),
        round(lit(1.0) / n, 12).as("r"))
      for (_ <- 1 to iters) {
        // contributions flow a→b: r(a)/d(a) summed per target b
        val contrib = e.join(ranks, e("a") === ranks("v"))
          .join(deg.select(col("a").as("da"), col("d")), col("a") === col("da"))
          .select(col("b").as("v"), (col("r") / col("d")).as("c"))
        ranks = contrib.groupBy("v")
          .agg(round(lit(0.15) / n + lit(0.85) * sum("c"), 12).as("r"))
      }
      ranks.join(deg.select(col("a").as("v"), col("d").as("degree")), "v")
        .select(col("v").as("node"), col("r").as("rank"), col("degree"))
        .orderBy(desc("rank"), asc("node"))
        .limit(topN)
    } finally { e.unpersist(); () }
  }

  /** DuckDB twin of [[pageRank]] (iters = 2, topN = 20). */
  def pageRankOracle: String =
    """WITH e0 AS (SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b FROM lineitem),
      |e AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      |deg AS (SELECT a, count(*) AS d FROM e GROUP BY a),
      |nn AS (SELECT count(*) AS n FROM deg),
      |r0 AS (SELECT a AS v, round(1.0 / nn.n, 12) AS r FROM deg, nn),
      |c1 AS (SELECT e.b AS v, sum(r0.r / deg.d) AS s
      |       FROM e JOIN r0 ON e.a = r0.v JOIN deg ON e.a = deg.a GROUP BY e.b),
      |r1 AS (SELECT c1.v, round(0.15 / nn.n + 0.85 * c1.s, 12) AS r FROM c1, nn),
      |c2 AS (SELECT e.b AS v, sum(r1.r / deg.d) AS s
      |       FROM e JOIN r1 ON e.a = r1.v JOIN deg ON e.a = deg.a GROUP BY e.b),
      |r2 AS (SELECT c2.v, round(0.15 / nn.n + 0.85 * c2.s, 12) AS r FROM c2, nn)
      |SELECT r2.v AS node, r2.r AS rank, CAST(deg.d AS BIGINT) AS degree
      |FROM r2 JOIN deg ON r2.v = deg.a
      |ORDER BY rank DESC, node LIMIT 20""".stripMargin
}
