package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.kmeans.{KMeansSteps, RefKMeans}
import graft.sources.Tables

/** Driver contract — see SURVEY.md §7 + FIXTURES.md §C.
  *
  * Every operator from SURVEY.md §2 is a named query; each
  * SQL-expressible one has equivalent DuckDB SQL in [[oracleSql]]
  * (identical column names, identical ORDER BY, floats rounded to 6,
  * integer-ish columns cast to BIGINT on both sides).
  */
object SparkEntry {

  /** Flagship: full reference-parity K-Means fit (maximin seeding + Lloyd)
    * on sf0.001 embeddings → cluster sizes. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val pts = Tables.points(spark, "/root/testdata/sf0.001")
    RefKMeans.fitSizes(spark, pts, RefKMeans.Config(k = 4, firstId = Some(0L)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1/O2 — scan + typed projection
    "ingest_embeddings" -> ((s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), size(col("embedding")).cast("long").as("dim"))
        .orderBy("vec_id")),
    // O2 — relational → vector synthesis (lineitem numerics), L2 norm
    "lineitem_features" -> ((s, dir) =>
      Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(VectorOps.l2norm(
          array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")).cast("array<double>")), 6).as("fnorm"))
        .orderBy("l_orderkey", "l_linenumber", "fnorm")),
    // O7 — min distance to centroid set (k-means++ scoring)
    "kmeans_min_dist" -> ((s, dir) => KMeansSteps.minDistances(s, dir)),
    // O8/O10 — farthest point (maximin candidate)
    "kmeans_farthest" -> ((s, dir) => KMeansSteps.farthestPoint(s, dir)),
    // O11 — E-step assignment
    "kmeans_assign" -> ((s, dir) =>
      KMeansSteps.assignment(s, dir)
        .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"))),
    // O18 — cluster sizes
    "kmeans_sizes" -> ((s, dir) =>
      KMeansSteps.clusterSizes(s, dir)
        .select(col("cluster_id").cast("long").as("cluster_id"), col("n"))),
    // O12/O14/O15 — recenter (partial-agg vector mean)
    "kmeans_recenter" -> ((s, dir) =>
      KMeansSteps.recenterLong(s, dir)
        .select(col("cluster_id").cast("long").as("cluster_id"),
          col("dim").cast("long").as("dim"), col("n"), col("mean"))),
    // O16 — convergence delta
    "kmeans_delta" -> ((s, dir) => KMeansSteps.delta(s, dir)),
    // O21 — 2-D reshape projection
    "kmeans_reshape" -> ((s, dir) =>
      KMeansSteps.reshape2d(s, dir)
        .select(col("vec_id"), col("bucket").cast("long").as("bucket"), col("value"))),
    // O22 — intra-set cohesion (avg point-to-set distance)
    "kmeans_avg_distance" -> ((s, dir) => KMeansSteps.avgDistance(s, dir)),
    // M3 — full iterative fit (not SQL-expressible; rows-only check)
    "kmeans_fit" -> ((s, dir) =>
      RefKMeans.fitSizes(s, Tables.points(s, dir),
        RefKMeans.Config(k = 8, firstId = Some(0L)))
        .select(col("cluster_id").cast("long").as("cluster_id"), col("n")))
  )

  // ---------------------------------------------------------------- oracle

  private val K = KMeansSteps.K

  /** Shared DuckDB fragments: points and literal centroids (the K
    * lowest-id embeddings, cid = vec_id — same convention as
    * [[KMeansSteps.centroids]]). */
  private val PTS =
    "pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
  private val CENTS =
    s"cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c FROM embeddings WHERE vec_id < $K)"
  /** Per (point, centroid) distance + argmin assignment. */
  private val ASSIGN =
    s"""d AS (SELECT p.vec_id, c.cid, list_distance(p.v, c.c) AS dist
       |       FROM pts p CROSS JOIN cents c),
       |a AS (SELECT vec_id, cid FROM (
       |        SELECT vec_id, cid,
       |               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |        FROM d) WHERE rn = 1)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ingest_embeddings" ->
      "SELECT vec_id, len(embedding) AS dim FROM embeddings ORDER BY vec_id",
    "lineitem_features" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       round(sqrt(l_quantity*l_quantity + l_extendedprice*l_extendedprice
        |             + l_discount*l_discount + l_tax*l_tax), 6) AS fnorm
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, fnorm""".stripMargin,
    "kmeans_min_dist" ->
      s"""WITH $PTS, $CENTS
         |SELECT p.vec_id, round(min(list_distance(p.v, c.c)), 6) AS min_dist
         |FROM pts p CROSS JOIN cents c GROUP BY p.vec_id ORDER BY vec_id""".stripMargin,
    "kmeans_farthest" ->
      s"""WITH $PTS, $CENTS,
         |md AS (SELECT p.vec_id, min(list_distance(p.v, c.c)) AS md
         |       FROM pts p CROSS JOIN cents c GROUP BY p.vec_id)
         |SELECT vec_id, round(md, 6) AS min_dist FROM md
         |ORDER BY md DESC, vec_id LIMIT 1""".stripMargin,
    "kmeans_assign" ->
      s"""WITH $PTS, $CENTS, $ASSIGN
         |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM a ORDER BY vec_id""".stripMargin,
    "kmeans_sizes" ->
      s"""WITH $PTS, $CENTS, $ASSIGN
         |SELECT CAST(cid AS BIGINT) AS cluster_id, count(*) AS n
         |FROM a GROUP BY cid ORDER BY cluster_id""".stripMargin,
    "kmeans_recenter" ->
      s"""WITH $PTS, $CENTS, $ASSIGN,
         |j AS (SELECT a.cid, p.v FROM a JOIN pts p USING (vec_id)),
         |l AS (SELECT cid, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM j)
         |SELECT CAST(cid AS BIGINT) AS cluster_id, CAST(dim AS BIGINT) AS dim,
         |       count(*) AS n, round(sum(x) / count(*), 6) AS mean
         |FROM l GROUP BY cid, dim ORDER BY cluster_id, dim""".stripMargin,
    "kmeans_delta" ->
      s"""WITH $PTS, $CENTS, $ASSIGN,
         |j AS (SELECT a.cid, p.v FROM a JOIN pts p USING (vec_id)),
         |l AS (SELECT cid, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM j),
         |m AS (SELECT cid, dim, sum(x) / count(*) AS mean FROM l GROUP BY cid, dim),
         |o AS (SELECT cid, generate_subscripts(c, 1) - 1 AS dim, unnest(c) AS oc FROM cents),
         |disp AS (SELECT m.cid, sqrt(sum((m.mean - o.oc) * (m.mean - o.oc))) AS disp
         |         FROM m JOIN o ON m.cid = o.cid AND m.dim = o.dim GROUP BY m.cid)
         |SELECT round(sum(disp) / count(*), 6) AS delta FROM disp""".stripMargin,
    "kmeans_reshape" ->
      s"""WITH $PTS,
         |l AS (SELECT vec_id, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM pts)
         |SELECT vec_id, CAST(CASE WHEN dim < 32 THEN 0 ELSE 1 END AS BIGINT) AS bucket,
         |       round(sum(x) / count(*), 6) AS value
         |FROM l GROUP BY vec_id, 2 ORDER BY vec_id, bucket""".stripMargin,
    "kmeans_avg_distance" ->
      """WITH pts AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |pair AS (SELECT a.label, a.vec_id, list_distance(a.v, b.v) AS d
        |         FROM pts a JOIN pts b ON a.label = b.label),
        |nz AS (SELECT * FROM pair WHERE d > 0),
        |pp AS (SELECT label, vec_id, sum(d) / count(*) AS ad FROM nz GROUP BY label, vec_id)
        |SELECT label, round(sum(ad) / count(*), 6) AS avg_dist
        |FROM pp GROUP BY label ORDER BY label""".stripMargin
  )
}
