package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc skew attribution harness (the PerfProbe convention — not part
  * of the bench or correctness surface). Measures hot-key skew in the
  * dedup_jaccard_prefix PPJoin pipeline (VERDICT r16 task 5): the
  * prefix posting-list size distribution (the pair expansion is
  * quadratic per list, so one hot shingle serializes a task), plus the
  * candidate-pair count the expansion emits.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mirror jaccardPrefix's prefix selection exactly (JacNum/JacDen =
    // 3/5): per-doc shingles ordered by ascending global df, first
    // n - ceil(t*n) + 1 kept
    import org.apache.spark.sql.expressions.Window
    val base = graft.operators.Dedup.hashedShingles(spark, sfDir)
    val sh = base.select(col("doc_id"), explode(col("hsh")).as("shh"))
    val dfRel = sh.groupBy("shh").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
    val pref = sh.join(dfRel, "shh")
      .select(col("doc_id"), col("shh"),
        row_number().over(w.orderBy("df", "shh")).as("rn"),
        count(lit(1)).over(w).as("n"))
      .filter(col("rn") <= col("n") - expr("(3 * n + 5 - 1) div 5") + 1)
    val lists = pref.groupBy("shh").agg(count(lit(1)).as("len"))
      .persist()
    val stats = lists.agg(count(lit(1)).as("n_lists"),
      max("len").as("max"), avg("len").as("avg"),
      expr("percentile_approx(len, 0.5)").as("p50"),
      expr("percentile_approx(len, 0.99)").as("p99"),
      sum(expr("len * (len - 1) div 2")).as("pairs_expanded"))
      .collect().head
    println(s"SKEW jaccard_prefix posting lists: n=${stats.get(0)} " +
      s"max=${stats.get(1)} avg=${stats.get(2)} p50=${stats.get(3)} " +
      s"p99=${stats.get(4)} pairs_expanded=${stats.get(5)}")
    println("SKEW top-20 posting lists by length:")
    lists.orderBy(desc("len")).limit(20).collect()
      .foreach(r => println(s"SKEW   shh=${r.get(0)} len=${r.get(1)}"))
    spark.stop()
  }
}
