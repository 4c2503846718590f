package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf attribution harness (PERF.md "json_props attribution").
  * Times a handful of parse strategies over the events `props` column,
  * N repetitions each, printing per-rep wall times — so a cost can be
  * split into first-use (class-load/codegen) vs steady-state parts.
  * Not part of the bench or correctness surface.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))

    def events: DataFrame = graft.sources.Tables.events(spark, sfDir)

    def agg(df: DataFrame): Long = df
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
      .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
      .count()

    val variants: Seq[(String, () => Long)] = Seq(
      "bench_warmup_fj" -> (() => spark.range(20000)
        .repartition(cpus.toInt)
        .select(from_json(
          concat(lit("{\"k\": "), (col("id") % 100).cast("string"), lit("}")),
          schema).getField("k").as("k"))
        .agg(sum("k")).count()),
      "scan_only" -> (() => events.select("event_type", "props").count()),
      "warm_1part" -> (() => spark.range(8).coalesce(1)
        .select(from_json(
          concat(lit("{\"k\": "), col("id").cast("string"), lit("}")),
          schema).getField("k").as("k"))
        .agg(sum("k")).count()),
      "fj_range_32p" -> (() => agg(spark.range(100000)
        .repartition(32)
        .select((col("id") % 5).cast("string").as("event_type"),
          from_json(
            concat(lit("{\"k\": "), (col("id") % 100).cast("string"), lit("}")),
            schema).getField("k").as("k")))),
      "fj_parquet_plan" -> (() => {
        val df = events.select(col("event_type"),
          from_json(col("props"), schema).getField("k").as("k"))
          .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
          .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        df.queryExecution.executedPlan // force analysis+optimize+plan
        0L
      }),
      "fj_parquet_noagg" -> (() => events.select(
        from_json(col("props"), schema).getField("k").as("k"))
        .filter(col("k") >= 0).count()),
      "from_json" -> (() => agg(events.select(col("event_type"),
        from_json(col("props"), schema).getField("k").as("k")))),
      "plain_agg" -> (() => agg(events.select(col("event_type"),
        length(col("props")).cast("long").as("k")))),
      "get_json_object" -> (() => agg(events.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k")))),
      "regexp_extract" -> (() => agg(events.select(col("event_type"),
        regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1)
          .cast("long").as("k")))),
      "from_json_again" -> (() => agg(events.select(col("event_type"),
        from_json(col("props"), schema).getField("k").as("k"))))
    )
    // stage-level accounting: wall vs executor task time exposes whether
    // a slow query burned its time in tasks or on the driver
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          stageLog.add(f"stage ${si.stageId} tasks=${si.numTasks} " +
            f"wall=$wall%.2f exec=${si.taskMetrics.executorRunTime / 1e3}%.2f " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.2f " +
            f"deser=${si.taskMetrics.executorDeserializeTime / 1e3}%.2f")
        }
      })
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "4").toInt
    for ((name, fn) <- variants) {
      val times = (1 to reps).map { i =>
        stageLog.clear()
        val t0 = System.nanoTime(); fn(); val dt = (System.nanoTime() - t0) / 1e9
        if (dt > 1.5) {
          Thread.sleep(200) // let stage-completed events drain
          stageLog.forEach(s => println(s"PROBE-STAGE $name rep$i $s"))
        }
        dt
      }
      println(f"PROBE $name%-16s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
