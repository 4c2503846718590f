package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    for (name <- Seq("ingest_embeddings", "kmeans_assign", "q1_agg", "join_mkt",
        "kmeans_recenter", "events_hourly", "range_join", "join_geo",
        "ann_lsh_topk", "events_funnel", "cube_agg")) {
      println(s"\n===== $name =====")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
