package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Result sinks mirroring the reference's export surface.
  *
  *  - O19 per-cluster CSV (`main/client/client.go:236-256`: one CSV per
  *    cluster, rows `id, coord…`): `partitionBy(cluster_id)` — each
  *    cluster becomes a partition directory, written in parallel by the
  *    executors instead of the reference's single-threaded client loop.
  *  - O3 dataset catalog listing (`main/client/client.go:151-170`).
  *  - O20's chart payload is the sizes aggregate
  *    ([[graft.kmeans.KMeansSteps.clusterSizes]]); rendering is
  *    client-side in the reference (`plot/plotter.go`) and out of engine
  *    scope.
  */
object Sinks {

  /** O19 — per-cluster export: `out/cluster_id=<k>/part-*.csv`, rows
    * `id, coord0, coord1, …` (the assignment DataFrame `(id, features,
    * cluster_id)` flattened to scalar columns; CSV has no arrays). */
  def writeClustersCsv(assigned: DataFrame, d: Int, out: String): Unit = {
    val coords = (0 until d).map(i => col("features").getItem(i).as(s"c$i"))
    assigned.select(col("cluster_id") +: col("id") +: coords: _*)
      .write.mode("overwrite")
      .partitionBy("cluster_id")
      .option("header", "true")
      .csv(out)
  }

  /** Same export as parquet — the scale-appropriate format (columnar,
    * typed, splittable); partition pruning makes per-cluster reads free. */
  def writeClustersParquet(assigned: DataFrame, out: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(out)

  /** JSON-lines export (arrays serialize natively, unlike CSV) —
    * interchange format for downstream non-columnar consumers. Same
    * per-cluster partition layout as the CSV sink. */
  def writeClustersJson(assigned: DataFrame, out: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cluster_id").json(out)

  /** JSON-lines ingest with explicit schema (schema inference needs an
    * extra pass over the data — never at scale). */
  def readJson(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC export — the second columnar lake format (same partition-pruned
    * layout as parquet; predicate pushdown + column pruning work the
    * same way through Spark's ORC datasource). */
  def writeClustersOrc(assigned: DataFrame, out: String): Unit =
    assigned.write.mode("overwrite").partitionBy("cluster_id").orc(out)

  /** ORC ingest with explicit schema. */
  def readOrc(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Date-partitioned event export: `out/event_date=YYYY-MM-DD/...` —
    * the standard time-partitioned lake layout. Date-bounded readers
    * prune partitions at planning time (PartitionFilters in the scan),
    * so a day query over a year of data touches 1/365th of the files. */
  def writeEventsByDate(events: DataFrame, out: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(out)

  /** Bucketed table write — the co-located-join layout for 100 TB facts:
    * both join sides bucketed by the join key into the same bucket count
    * hash-place matching keys in matching files, so the join runs with NO
    * shuffle exchange (each task zips bucket i ⋈ bucket i). The physical
    * contract Spark gives for pre-partitioned storage. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Z-ordered lake write ([[graft.operators.Relational.zorderKey]]'s
    * layout half): range-partition and sort the table by the Morton key
    * so rows close in BOTH interleaved dimensions land in the same
    * files. Parquet then records per-file min/max for the ORIGINAL
    * columns, and a selective predicate on either dimension skips most
    * files — the OPTIMIZE ZORDER technique, with no table-format
    * dependency. `repartitionByRange` samples the key (one extra pass)
    * to build balanced file-sized ranges at any scale. */
  def writeZOrdered(df: DataFrame, zkey: org.apache.spark.sql.Column,
      files: Int, out: String): Unit =
    df.withColumn("_z", zkey)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(out)

  /** O3 — catalog listing: the datasets (tables) available under an sf
    * directory. */
  def listDatasets(spark: SparkSession, sfDir: String): Seq[String] =
    new java.io.File(sfDir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet")).sorted.toSeq
}
