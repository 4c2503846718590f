package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first measured query isn't charged for
    // JVM cold start (runs a scan + a vector kernel once)
    try {
      graft.sources.Tables.points(spark, sfDir)
        .select(org.apache.spark.sql.functions.sum(
          graft.functions.VectorOps.dot(
            org.apache.spark.sql.functions.col("features"),
            org.apache.spark.sql.functions.col("features")))).count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    } catch { case _: Throwable => }
    // deterministic run order; clear leaked caches between queries so a
    // branched pipeline's persist() doesn't tax its successors
    // dev-loop subset filter (unset for the driver's full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.forall(_.contains(kv._1))).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
        false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (name, dt, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a crashed query must be visible in the JSON, not silently folded
    // into the total as its time-to-failure
    val failed = results.collect { case (k, _, false) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
