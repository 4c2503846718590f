package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.kmeans.KMeansSteps
import graft.sources.Tables
import org.apache.spark.sql.graft.ColumnBridge
import graft.plans.{MinSqDistToCentroids, NearestCentroidId}

/** Scratch perf probe — not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    val pts = Tables.points(spark, sf)
    t("warmup count")(pts.count())
    val cs = KMeansSteps.centroids(spark, sf)
    val csArr = cs.map(_._2).toArray

    t("assign literal HOF")(
      pts.select(VectorOps.nearestCid(col("features"), cs).as("cid"))
        .groupBy("cid").count().collect().length)
    t("assign kernel")(
      pts.select(ColumnBridge.column(NearestCentroidId(
          ColumnBridge.expression(col("features")), csArr)).as("cid"))
        .groupBy("cid").count().collect().length)
    t("assign literal HOF again")(
      pts.select(VectorOps.nearestCid(col("features"), cs).as("cid"))
        .groupBy("cid").count().collect().length)
    t("assign kernel again")(
      pts.select(ColumnBridge.column(NearestCentroidId(
          ColumnBridge.expression(col("features")), csArr)).as("cid"))
        .groupBy("cid").count().collect().length)
    t("minDist literal sum")(
      pts.select(VectorOps.minDist(col("features"), cs).as("md"))
        .agg(sum("md")).collect().length)
    t("minDist kernel sum")(
      pts.select(sqrt(ColumnBridge.column(MinSqDistToCentroids(
          ColumnBridge.expression(col("features")), csArr))).as("md"))
        .agg(sum("md")).collect().length)
    t("sizes (current query)")(KMeansSteps.clusterSizes(spark, sf).count())
    t("recenter (current query)")(KMeansSteps.recenterLong(spark, sf).count())
    t("delta (current query)")(KMeansSteps.delta(spark, sf).count())
    spark.stop()
  }
}
