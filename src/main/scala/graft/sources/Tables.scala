package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (`/root/testdata/sf*`,
  * see TESTDATA.md) plus the reference's native headerless-CSV point format.
  *
  * Reference ingest surface: CSV scan (`main/client/client.go:172-186`),
  * float64 cast projection with ordinal row ids (`utils/utils.go:21-42`),
  * dataset catalog listing (`main/client/client.go:151-170`). Here the scan
  * is `spark.read.parquet`/`csv` (columnar, predicate-pushdown capable);
  * row ids come from the source (`vec_id`) instead of the reference's
  * per-chunk ordinal quirk (ids restart every 100k rows,
  * `main/client/client.go:61-63,122`).
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB oracle's table namespace. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else apply(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** Events with `ts` normalized to a microsecond TIMESTAMP, whatever the
    * fixture generation encoded:
    *  - TIMESTAMP(NANOS): Spark 4 only reads it with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (raw nano longs);
    *    `div 1000` (exact integer division — a double roundtrip would
    *    lose precision above 2^53) matches DuckDB's nanos→micros read.
    *  - TIMESTAMP(MICROS) isAdjustedToUTC=false: Spark reads
    *    TIMESTAMP_NTZ; downstream `unix_micros`/window functions need
    *    TimestampType, so cast. The cast interprets the naive value in
    *    the session time zone — callers (Verify/Bench/specs) pin
    *    `spark.sql.session.timeZone=UTC` so it is machine-independent
    *    and equal to DuckDB's naive read.
    *  - TIMESTAMP(MICROS) adjusted to UTC: already TimestampType. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = apply(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** The documents relation widened to the session's core parallelism
    * when the file layout provides fewer scan tasks than cores (r17 —
    * guide §2.5 "input skew: one huge unsplittable file … repartition
    * immediately after the read" and §6 input-split sizing): the bench
    * fixtures store documents as a few large parquet files, so the
    * corpus-wide CPU-heavy sweeps (the CDC gram pass, the shingle md5
    * sweep, the winnow fingerprint pass — each hashes every char/gram
    * position of every document) otherwise run at FILE-count
    * parallelism (2 scan tasks on 32 cores at the sf10 probe, measured
    * — the chunk_cdc cold build's 53 s). A real 100 TB lake has
    * thousands of files and takes the else branch, paying no shuffle.
    * Round-robin repartition (deterministic under retry via Spark's
    * sort-before-repartition); every consumer re-keys or aggregates by
    * doc_id downstream, so row order never reaches an output. */
  def documentsWide(spark: SparkSession, sfDir: String): DataFrame = {
    val d = apply(spark, sfDir, "documents")
    val cores = math.max(1, spark.sparkContext.defaultParallelism)
    if (d.rdd.getNumPartitions < cores) d.repartition(cores) else d
  }

  /** The K-Means points relation: (id LONG, features ARRAY<DOUBLE>).
    * Maps the reference's `Points` (`utils/utils.go:8-13`) onto the
    * embeddings table; FLOAT[] is widened to DOUBLE[] to match the
    * reference's float64-everywhere data model (`utils/utils.go:27-30`). */
  def points(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "embeddings").select(
      col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("features"))

  /** Relational → vector synthesis: numeric lineitem columns as a dense
    * feature vector, exercising the same ingest path from a star-schema
    * fact table (SURVEY.md §7.2 M0). NOTE: `id` is NOT unique — the
    * synthetic fixture contains duplicate (l_orderkey, l_linenumber)
    * pairs with different values (45,832 distinct ids over 60,000 rows
    * at sf0.01). The fit treats ids only as deterministic-pick
    * tie-breaks; anything needing per-row identity (e.g. a per-point
    * oracle argmin) must key on a row id, not this id. */
  def lineitemPoints(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "lineitem").select(
      (col("l_orderkey") * lit(10) + col("l_linenumber")).cast("long").as("id"),
      array(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax")).cast("array<double>").as("features"))

  /** [[lineitemPoints]] z-score standardized per dimension (mean/std are
    * one tiny aggregate collected driver-side, then a narrow literal
    * projection). Unstandardized lineitem numerics span 6 orders of
    * magnitude (price ~1e5 vs discount ~1e-1), which makes a
    * mean-displacement convergence threshold meaningless.
    *
    * r16: materialized per corpus through the scratch registry — the
    * standardized feature build (full lineitem scan + projection) is
    * shared by the whole lineitem fit family (`kmeans_fit_lineitem`,
    * `_final`, `_trajectory`), which previously each re-derived it;
    * the projected doubles round-trip parquet exactly, so consumers
    * are bit-identical to the in-plan projection. */
  def lineitemPointsStd(spark: SparkSession, sfDir: String): DataFrame =
    Scratch.materialize(spark,
        s"li_points_std:${Scratch.corpusKey(sfDir)}") {
      lineitemPointsStdWith(spark, sfDir, lineitemStatsShared(spark, sfDir))
    }

  // per-JVM stats registry (the pqCodebooks device): the 1-row
  // standardization aggregate is collected once per corpus instead of
  // once per consuming query; CacheProbe carries cold/warm provenance
  // and the bench's re-run eviction
  private val liStatsReg =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Double, Double)]]

  /** [[lineitemStats]] cached per corpus (content-addressed key).
    * First-call builds serialize under the registry lock — TrieMap's
    * `getOrElseUpdate` is not atomic for side effects, so two
    * concurrent first callers would both run the 1-row aggregate
    * (benign but inconsistent with [[Scratch.materialize]]'s own
    * documented rationale; VERDICT r16 item 5). */
  def lineitemStatsShared(spark: SparkSession, sfDir: String): Seq[(Double, Double)] =
    liStatsReg.synchronized {
      val ck = Scratch.corpusKey(sfDir)
      val hit = liStatsReg.contains(ck)
      val v = liStatsReg.getOrElseUpdate(ck, lineitemStats(spark, sfDir))
      CacheProbe.record(s"li_stats:$ck", built = !hit)(
        { liStatsReg.remove(ck); () })
      v
    }

  /** Per-dimension (mean, clamped std) of [[lineitemPoints]] — exposed so
    * frozen-state oracles can carry the exact literals the projection
    * used (the standardized features are then bit-identical across
    * engines: one subtract + one divide on identical inputs). */
  def lineitemStats(spark: SparkSession, sfDir: String): Seq[(Double, Double)] = {
    val pts = lineitemPoints(spark, sfDir)
    val d = 4
    val aggs = (0 until d).flatMap(i => Seq(
      avg(col("features").getItem(i)).as(s"m$i"),
      stddev_pop(col("features").getItem(i)).as(s"s$i")))
    val r = pts.agg(aggs.head, aggs.tail: _*).head()
    (0 until d).map(i =>
      (r.getDouble(2 * i), math.max(r.getDouble(2 * i + 1), 1e-12)))
  }

  /** [[lineitemPoints]] standardized against explicit per-dim stats. */
  def lineitemPointsStdWith(spark: SparkSession, sfDir: String,
      stats: Seq[(Double, Double)]): DataFrame = {
    val pts = lineitemPoints(spark, sfDir)
    val proj = array(stats.zipWithIndex.map { case ((m, s), i) =>
      (col("features").getItem(i) - lit(m)) / lit(s)
    }: _*)
    pts.select(col("id"), proj.as("features"))
  }

  /** Reference-native ingest: headerless CSV of floats, ordinal row id
    * (`utils/utils.go:21-42` — but with globally-unique ids, fixing the
    * 100k-chunk id-restart quirk of `client.go:61-63`). */
  def csvPoints(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "false").option("inferSchema", "true").csv(path)
    val cols = raw.columns.toIndexedSeq.map(c => col(c).cast("double"))
    raw.select(array(cols: _*).as("features"))
      .withColumn("id", monotonically_increasing_id())
      .select(col("id"), col("features"))
  }
}
