package graft.kmeans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.sources.Tables

/** Oracle coverage for the CONVERGED fit — the end state of the full
  * reference loop (`main/master/master.go:193-236`), not just its
  * mechanics (those are pinned by `kmeans_fit_steps`).
  *
  * Design: run [[RefKMeans.fit]] to convergence once per sf directory,
  * FREEZE the converged centroids, and expose
  *  - `kmeans_fit_final`  — per-cluster size + WCSS from the frozen
  *    centroids, plus a `converged` flag, and
  *  - `kmeans_fit_assign` — the final per-point assignment,
  * while the DuckDB oracle receives the same centroids as SQL literals
  * (full-precision, round-trip decimal) and INDEPENDENTLY recomputes the
  * assignment, sizes and WCSS — and replays one further Lloyd round to
  * assert the stop rule held: the mean centroid displacement from the
  * frozen state is < deltaThreshold (`master.go:212-217` stops BEFORE
  * updating, so the reported centroids are exactly the state whose next
  * delta was sub-threshold). Spark cannot "agree with itself" here: the
  * oracle derives everything from the literals with its own argmin,
  * sums and threshold comparison.
  *
  * The config matches the rows-only `kmeans_fit` query bit-for-bit, so
  * its (cluster_id, n) output is cross-pinned by `kmeans_fit_final`'s
  * oracle-checked sizes.
  *
  * The oracle SQL depends on the data (the converged state), so it is
  * generated AFTER the queries run: `graft.Verify` executes every query
  * first, then dumps [[graft.SparkEntry.oracleSql]], by which time
  * [[last]] holds the frozen centroids for the verified sf directory.
  */
object FitFinal {

  /** Same config as the `kmeans_fit` query (k = 8, deterministic first
    * centroid, delta threshold 0.01, cap 100). */
  val Cfg: RefKMeans.Config = RefKMeans.Config(k = 8, firstId = Some(0L))

  /** Same config as the `kmeans_fit_pp` query (D²-weighted k-means++
    * seeding, seed 42). The loop and stop rule are identical — only the
    * seeding differs, so the same frozen-state oracle applies. */
  val CfgPP: RefKMeans.Config = RefKMeans.Config(k = 8, seed = 42L, ppSeeding = true)

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, Boolean), RefKMeans.Result]

  /** Most recent (sfDir, variant → result) — read by [[oracleSqls]]. */
  @volatile private var last: Option[(String, Map[Boolean, RefKMeans.Result])] = None

  /** Converged fit for `sfDir` (maximin or ++ seeding), computed once
    * per JVM (queries and the oracle generator share it — identical
    * literals everywhere). */
  def result(spark: SparkSession, sfDir: String, pp: Boolean = false): RefKMeans.Result = {
    val res = cache.getOrElseUpdate((sfDir, pp), {
      val r = RefKMeans.fit(Tables.points(spark, sfDir), if (pp) CfgPP else Cfg)
      // the oracle's delta replay asserts convergence — a maxIter exit
      // reports POST-update centroids (reference quirk) whose replayed
      // delta is the NEXT round's, not the recorded one: fail loudly
      // instead of producing an incomparable record
      require(r.converged,
        s"kmeans_fit_final requires a converged fit (iter=${r.iterations}, delta=${r.finalDelta})")
      r
    })
    last match {
      case Some((dir, m)) if dir == sfDir => last = Some((dir, m + (pp -> res)))
      case _ => last = Some((sfDir, Map(pp -> res)))
    }
    res
  }

  private def cents(res: RefKMeans.Result): Array[Array[Double]] =
    res.centroids.sortBy(_._1).map(_._2)

  /** Final per-cluster summary from the frozen converged centroids:
    * (cluster_id, n, wcss, converged). One narrow argmin map + one k-row
    * aggregate — the same physical shape as every other step query. */
  def finalSummary(spark: SparkSession, sfDir: String, pp: Boolean = false): DataFrame = {
    val res = result(spark, sfDir, pp)
    val cs = cents(res)
    val md = minDistK(col("features"), cs)
    Tables.points(spark, sfDir)
      .select(nearestCidK(col("features"), cs).cast("long").as("cluster_id"),
        (md * md).as("sq"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"), round(sum("sq"), 6).as("wcss"))
      .withColumn("converged", lit(if (res.converged) 1L else 0L))
      .orderBy("cluster_id")
  }

  /** Final membership (O17's end state) from the frozen centroids:
    * (vec_id, cluster_id). */
  def finalAssign(spark: SparkSession, sfDir: String, pp: Boolean = false): DataFrame = {
    val res = result(spark, sfDir, pp)
    Tables.points(spark, sfDir)
      .select(col("id").as("vec_id"),
        nearestCidK(col("features"), cents(res)).cast("long").as("cluster_id"))
      .orderBy("vec_id")
  }

  /** The frozen centroids as a DuckDB VALUES relation `cents(cid, c)`.
    * `java.lang.Double.toString` is the shortest round-trip decimal —
    * DuckDB parses it back to the identical IEEE double, so both engines
    * run their kernels over the same 64-bit values. */
  private def centsSql(res: RefKMeans.Result): String =
    res.centroids.sortBy(_._1).map { case (cid, v) =>
      v.map(java.lang.Double.toString).mkString(s"($cid, CAST([", ", ", "] AS DOUBLE[]))")
    }.mkString("cents AS (SELECT * FROM (VALUES ", ", ", ") AS t(cid, c))")

  /** Oracle SQL for the frozen-state queries, available once [[result]]
    * has run in this JVM for the variant (Verify's dump ordering
    * guarantees that); absent otherwise so a partial dev run degrades to
    * the rows-only check instead of emitting stale literals. */
  def oracleSqls: Map[String, String] = last match {
    case None => Map.empty
    case Some((_, byVariant)) =>
      val pts =
        "pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
      val assign =
        """d AS (SELECT p.vec_id, c.cid, list_distance(p.v, c.c) AS dist
          |       FROM pts p CROSS JOIN cents c),
          |a AS (SELECT vec_id, cid, dist FROM (
          |        SELECT vec_id, cid, dist,
          |               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
          |        FROM d) WHERE rn = 1)""".stripMargin
      def summarySql(res: RefKMeans.Result, cfg: RefKMeans.Config): String =
        s"""WITH $pts, ${centsSql(res)},
           |$assign,
           |l AS (SELECT a.cid, generate_subscripts(p.v, 1) - 1 AS dim, unnest(p.v) AS x
           |      FROM a JOIN pts p USING (vec_id)),
           |m AS (SELECT cid, dim, sum(x) / count(*) AS mean FROM l GROUP BY cid, dim),
           |c0 AS (SELECT cid, generate_subscripts(c, 1) - 1 AS dim, unnest(c) AS x FROM cents),
           |disp AS (SELECT c0.cid,
           |                sqrt(sum((coalesce(m.mean, c0.x) - c0.x)
           |                       * (coalesce(m.mean, c0.x) - c0.x))) AS disp
           |         FROM c0 LEFT JOIN m USING (cid, dim) GROUP BY c0.cid),
           |delta AS (SELECT sum(disp) / ${cfg.k} AS delta FROM disp)
           |SELECT CAST(a.cid AS BIGINT) AS cluster_id, count(*) AS n,
           |       round(sum(a.dist * a.dist), 6) AS wcss,
           |       CAST((SELECT delta FROM delta) < ${cfg.deltaThreshold} AS BIGINT) AS converged
           |FROM a GROUP BY a.cid ORDER BY cluster_id""".stripMargin
      def assignSql(res: RefKMeans.Result): String =
        s"""WITH $pts, ${centsSql(res)},
           |$assign
           |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id
           |FROM a ORDER BY vec_id""".stripMargin
      byVariant.flatMap {
        case (false, res) => Map(
          "kmeans_fit_final" -> summarySql(res, Cfg),
          "kmeans_fit_assign" -> assignSql(res))
        case (true, res) => Map(
          "kmeans_fit_pp_final" -> summarySql(res, CfgPP))
      }
  }
}
