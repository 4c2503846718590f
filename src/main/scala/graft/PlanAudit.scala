package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan hygiene sweep: compact per-query counts of the operators that
  * signal scale smells (cartesian/NLJ joins, exchanges), plus full
  * formatted plans for names passed as args. `runMain graft.PlanAudit`
  * for the summary; add query names for details. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if (args.nonEmpty) {
      for (name <- args) {
        println(s"\n===== $name =====")
        println(SparkEntry.queries(name)(spark, sf).queryExecution
          .explainString(FormattedMode))
      }
    } else {
      def count(p: String, op: String): Int = s"\\(\\d+\\) $op".r.findAllIn(p).length
      println(f"${"query"}%-22s ex  smj  bhj  nlj cart  wsc")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          // materialize first: under AQE the pre-execution plan is the
          // INITIAL one — runtime SMJ→BHJ conversions, coalesced
          // exchanges and codegen stage ids only exist in the final plan
          val qe = fn(spark, sf).queryExecution
          qe.executedPlan.execute().count()
          val p = qe.explainString(FormattedMode)
          val flag = if (count(p, "CartesianProduct") > 0 ||
            count(p, "BroadcastNestedLoopJoin") > 0) "  <-- CHECK" else ""
          println(f"$name%-22s ${count(p, "Exchange")}%2d ${count(p, "SortMergeJoin")}%4d " +
            f"${count(p, "BroadcastHashJoin")}%4d ${count(p, "BroadcastNestedLoopJoin")}%4d " +
            f"${count(p, "CartesianProduct")}%4d " +
            // FormattedMode marks codegen membership as "[codegen id : N]"
            f"${"\\[codegen id : ".r.findAllIn(p).length}%4d$flag")
        } catch { case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage}") }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
