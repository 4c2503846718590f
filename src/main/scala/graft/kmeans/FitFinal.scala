package graft.kmeans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps._
import graft.sources.Tables

/** Oracle coverage for fit END STATES — the reference loop's output
  * (`main/master/master.go:193-236`), not just its mechanics (those are
  * pinned by `kmeans_fit_steps` / `ts_cluster_steps`).
  *
  * Design: run [[RefKMeans.fit]] once per (sf directory, variant),
  * FREEZE the reported centroids, and expose frozen-state queries while
  * the DuckDB oracle receives the same centroids as full-precision SQL
  * literals and INDEPENDENTLY recomputes the assignment, sizes and WCSS.
  * For variants whose fit CONVERGES, the oracle additionally replays one
  * further Lloyd round and asserts the stop rule held: the mean centroid
  * displacement from the frozen state is < deltaThreshold
  * (`master.go:212-217` stops BEFORE updating, so the reported centroids
  * are exactly the state whose next delta was sub-threshold). Spark
  * cannot "agree with itself" here: the oracle derives everything from
  * the literals with its own argmin, sums and threshold comparison.
  *
  * The `lineitem` variant exits via the iteration cap (the reference
  * quirk reports POST-update centroids, `master.go:212-231`), so its
  * recorded delta is not replayable from the frozen state — that
  * variant verifies the end-state materialization only (no `converged`
  * column). Its feature space is COMPUTED (z-standardized), so the
  * frozen literals include the per-dim standardization stats: both
  * engines then build features as one subtract + one divide on
  * identical inputs — bit-identical.
  *
  * Each variant's config matches its rows-only fit query bit-for-bit,
  * so those (cluster_id, n) outputs are cross-pinned by the
  * oracle-checked sizes here.
  *
  * The oracle SQL depends on the data (the fitted state), so it is
  * generated AFTER the queries run: `graft.Verify` executes every query
  * first, then dumps [[graft.SparkEntry.oracleSql]], by which time
  * [[last]] holds the frozen state for the verified sf directory.
  */
object FitFinal {

  /** Same config as the `kmeans_fit` query (k = 8, deterministic first
    * centroid, delta threshold 0.01, cap 100). */
  val Cfg: RefKMeans.Config = RefKMeans.Config(k = 8, firstId = Some(0L))

  /** Same config as the `kmeans_fit_pp` query (D²-weighted k-means++
    * seeding, seed 42). The loop and stop rule are identical — only the
    * seeding differs, so the same frozen-state oracle applies. */
  val CfgPP: RefKMeans.Config = RefKMeans.Config(k = 8, seed = 42L, ppSeeding = true)

  /** Same config as `kmeans_fit_lineitem` (k = 5, cap 20 — exits via
    * the cap at every fixture sf). */
  val CfgLineitem: RefKMeans.Config = RefKMeans.Config(k = 5, seed = 42L, maxIter = 20)

  /** Fit variants: (feature space, config, mustConverge). `mustConverge`
    * variants fail loudly on a cap exit (their oracle always carries the
    * stop-rule replay); the others claim — and oracle-verify —
    * convergence only when the fit actually converged, since a cap exit
    * reports POST-update centroids (reference quirk) whose replayed
    * delta is the NEXT round's, not the recorded one. */
  private val variants: Map[String, (String, RefKMeans.Config, Boolean)] = Map(
    "fit" -> (("embeddings", Cfg, true)),
    "pp" -> (("embeddings", CfgPP, true)),
    "lineitem" -> (("lineitem", CfgLineitem, false)),
    "ts" -> (("ts", graft.operators.TimeSeries.ClusterCfg, false)),
    // MLlib-trained model: training is probabilistic k-means|| (never
    // SQL-replayed, converged claim never made); scoring the frozen
    // centers is deterministic and oracle-checked like any other variant
    "mllib" -> (("embeddings", Cfg, false)))

  private case class Frozen(res: RefKMeans.Result, space: String,
      liStats: Option[Seq[(Double, Double)]]) {
    /** Whether the record carries the converged/stop-rule claim. */
    def claimsConvergence: Boolean = res.converged
  }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Frozen]

  /** Most recently verified sf directory — selects which slice of
    * [[cache]] the parameterless [[oracleSqls]] dumps. The frozen states
    * themselves live ONLY in the (sfDir, variant)-keyed TrieMap, so
    * concurrent fits or a second sf directory in the same JVM can never
    * drop a variant or pair literals with the wrong directory; the worst
    * a racing writer can do is flip WHICH complete directory gets
    * dumped, matching Verify's one-directory-per-run contract. */
  @volatile private var lastDir: Option[String] = None

  private def frozen(spark: SparkSession, sfDir: String, variant: String): Frozen = {
    val (space, cfg, mustConverge) = variants(variant)
    val cacheKey = (sfDir, variant)
    val cacheHit = cache.contains(cacheKey)
    val f = cache.getOrElseUpdate(cacheKey, {
      val liStats =
        if (space == "lineitem") Some(Tables.lineitemStatsShared(spark, sfDir)) else None
      val r =
        if (variant == "mllib")
          // external trainer: only the frozen centers matter; converged
          // stays false so no stop-rule claim is ever emitted
          RefKMeans.Result(MLlibKMeans.trainedCenters(spark, sfDir),
            iterations = 0, finalDelta = Double.NaN, converged = false)
        else {
          val points = space match {
            // reads the scratch-materialized std points (identical
            // doubles to the liStats projection — r16 shared build)
            case "lineitem" => Tables.lineitemPointsStd(spark, sfDir)
            case "ts" => graft.operators.TimeSeries.roundedPoints(spark, sfDir)
            case _ => Tables.points(spark, sfDir)
          }
          RefKMeans.fit(points, cfg)
        }
      require(r.converged || !mustConverge,
        s"$variant fit: expected convergence, got cap exit " +
          s"(iter=${r.iterations}, delta=${r.finalDelta})")
      Frozen(r, space, liStats)
    })
    graft.sources.CacheProbe.record(s"kmeans_fit:$cacheKey", built = !cacheHit)(
      { cache.remove(cacheKey); () })
    lastDir = Some(sfDir)
    f
  }

  def result(spark: SparkSession, sfDir: String, variant: String = "fit"): RefKMeans.Result =
    frozen(spark, sfDir, variant).res

  private def cents(res: RefKMeans.Result): Array[Array[Double]] =
    res.centroids.sortBy(_._1).map(_._2)

  private def pointsDF(spark: SparkSession, sfDir: String, f: Frozen): DataFrame =
    f.space match {
      case "lineitem" => Tables.lineitemPointsStd(spark, sfDir)
      case "ts" => graft.operators.TimeSeries.roundedPoints(spark, sfDir)
      case _ => Tables.points(spark, sfDir)
    }

  /** Final per-cluster summary from the frozen centroids: (cluster_id,
    * n, wcss[, converged]). One narrow argmin map + one k-row
    * aggregate — the same physical shape as every other step query. */
  def finalSummary(spark: SparkSession, sfDir: String, variant: String = "fit"): DataFrame = {
    val f = frozen(spark, sfDir, variant)
    val cs = cents(f.res)
    val md = minDistK(col("features"), cs)
    val base = pointsDF(spark, sfDir, f)
      .select(nearestCidK(col("features"), cs).cast("long").as("cluster_id"),
        (md * md).as("sq"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"), round(sum("sq"), 6).as("wcss"))
    // the converged column is a cross-engine CLAIM (DuckDB re-derives it
    // from the literals by replaying one round) — emitted only when the
    // fit really converged; a cap exit records the materialization alone
    val out =
      if (f.claimsConvergence) base.withColumn("converged", lit(1L))
      else base
    out.orderBy("cluster_id")
  }

  /** Final membership (O17's end state) from the frozen centroids:
    * (vec_id, cluster_id). */
  def finalAssign(spark: SparkSession, sfDir: String, variant: String = "fit"): DataFrame = {
    val f = frozen(spark, sfDir, variant)
    pointsDF(spark, sfDir, f)
      .select(col("id").as("vec_id"),
        nearestCidK(col("features"), cents(f.res)).cast("long").as("cluster_id"))
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

  /** The variant's point relation as a DuckDB CTE plus its per-ROW key.
    * Embeddings have unique `vec_id`s; the lineitem space does NOT (the
    * synthetic fixture holds duplicate (l_orderkey, l_linenumber) pairs
    * with different values — 45,832 distinct ids over 60,000 rows at
    * sf0.01), so its argmin must group on a synthetic row id or the
    * oracle silently drops colliding rows. The rid↔row pairing is
    * arbitrary, but assignment is a pure per-row function of `v`, so
    * every downstream aggregate is exact. */
  private def ptsSql(f: Frozen): (String, String) = f.space match {
    case "embeddings" =>
      ("pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "vec_id")
    case "ts" =>
      // composite window ids are unique — vec_id is a valid row key
      (graft.operators.TimeSeries.ptsOracleCtes(), "vec_id")
    case "lineitem" =>
      val st = f.liStats.get
      val dims = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val proj = st.zip(dims).map { case ((m, s), c) =>
        s"($c - ${java.lang.Double.toString(m)}) / ${java.lang.Double.toString(s)}"
      }.mkString("[", ", ", "]")
      (s"""pts AS (SELECT row_number() OVER () AS rid,
          |               CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS vec_id,
          |               $proj AS v FROM lineitem)""".stripMargin,
        "rid")
  }

  /** Frozen-state oracles for `sfDir`, straight from the TrieMap —
    * present only once the fit has run in this JVM for the variant
    * (Verify's dump ordering guarantees that); absent otherwise so a
    * partial dev run degrades to the rows-only check instead of
    * emitting stale literals. */
  def oracleSqlsFor(sfDir: String): Map[String, String] =
    render(cache.collect { case ((d, v), f) if d == sfDir => v -> f }.toMap)

  /** Parameterless variant for the [[graft.SparkEntry.oracleSql]]
    * contract: dumps the most recently verified directory's slice. */
  def oracleSqls: Map[String, String] =
    lastDir.map(oracleSqlsFor).getOrElse(Map.empty)

  /** Frozen converged 'fit' centroids (sorted by cid) for the most
    * recently verified directory — shared with
    * [[graft.operators.Dedup.semanticDedup]], whose oracle must carry
    * the exact same literals. Same run-then-dump contract as
    * [[oracleSqls]]: present only after the fit ran in this JVM. */
  def frozenFitCentroids: Option[Array[(Int, Array[Double])]] =
    lastDir.flatMap(d => cache.get((d, "fit"))).map(_.res.centroids.sortBy(_._1))

  private def render(byVariant: Map[String, Frozen]): Map[String, String] =
    byVariant match {
    case m if m.isEmpty => Map.empty
    case byVariant =>
      def assign(key: String) =
        s"""d AS (SELECT p.$key, c.cid, list_distance(p.v, c.c) AS dist
           |       FROM pts p CROSS JOIN cents c),
           |a AS (SELECT $key, cid, dist FROM (
           |        SELECT $key, cid, dist,
           |               row_number() OVER (PARTITION BY $key ORDER BY dist, cid) AS rn
           |        FROM d) WHERE rn = 1)""".stripMargin
      def summarySql(f: Frozen, cfg: RefKMeans.Config, withDelta: Boolean): String = {
        val (pts, key) = ptsSql(f)
        val deltaCtes = if (!withDelta) "" else
          s""",
             |l AS (SELECT a.cid, generate_subscripts(p.v, 1) - 1 AS dim, unnest(p.v) AS x
             |      FROM a JOIN pts p USING ($key)),
             |m AS (SELECT cid, dim, sum(x) / count(*) AS mean FROM l GROUP BY cid, dim),
             |c0 AS (SELECT cid, generate_subscripts(c, 1) - 1 AS dim, unnest(c) AS x FROM cents),
             |disp AS (SELECT c0.cid,
             |                sqrt(sum((coalesce(m.mean, c0.x) - c0.x)
             |                       * (coalesce(m.mean, c0.x) - c0.x))) AS disp
             |         FROM c0 LEFT JOIN m USING (cid, dim) GROUP BY c0.cid),
             |delta AS (SELECT sum(disp) / ${cfg.k} AS delta FROM disp)""".stripMargin
        val convergedCol = if (!withDelta) "" else
          s""",
             |       CAST((SELECT delta FROM delta) < ${cfg.deltaThreshold} AS BIGINT) AS converged""".stripMargin
        s"""WITH $pts, ${centsSql(f.res)},
           |${assign(key)}$deltaCtes
           |SELECT CAST(a.cid AS BIGINT) AS cluster_id, count(*) AS n,
           |       round(sum(a.dist * a.dist), 6) AS wcss$convergedCol
           |FROM a GROUP BY a.cid ORDER BY cluster_id""".stripMargin
      }
      def assignSql(f: Frozen): String = {
        val (pts, key) = ptsSql(f)
        s"""WITH $pts, ${centsSql(f.res)},
           |${assign(key)}
           |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id
           |FROM a ORDER BY vec_id""".stripMargin
      }
      byVariant.flatMap {
        case ("fit", f) => Map(
          "kmeans_fit_final" -> summarySql(f, Cfg, withDelta = true),
          "kmeans_fit_assign" -> assignSql(f))
        case ("pp", f) => Map(
          "kmeans_fit_pp_final" -> summarySql(f, CfgPP, withDelta = true))
        case ("lineitem", f) => Map(
          "kmeans_fit_lineitem_final" ->
            summarySql(f, CfgLineitem, withDelta = f.claimsConvergence))
        case ("ts", f) => Map(
          "ts_cluster_final" ->
            summarySql(f, graft.operators.TimeSeries.ClusterCfg,
              withDelta = f.claimsConvergence))
        case ("mllib", f) => Map(
          "kmeans_mllib_final" -> summarySql(f, Cfg, withDelta = false))
        case _ => Map.empty[String, String]
      }
  }
}
