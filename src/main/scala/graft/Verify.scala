package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match Bench: AQE may re-coalesce cached-plan output partitions
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-loop subset filter (unset for the driver's full run):
    // SPARK_GRAFT_ONLY=q1_agg,topk_window verifies just those queries
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // exclusion twin of ONLY (e.g. skipping declared-quadratic baselines
    // in an oversized-sf sweep)
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    def keep(name: String): Boolean =
      only.forall(_.contains(name)) && !skip.contains(name)
    // Queries that crash before dumping must still be visible in the
    // correctness record (the r7 driver artifact silently omitted six
    // crashed queries): collect name → exception and write errors.json
    // alongside the dumps for compare_oracle.py to merge as err entries.
    val errors = Seq.newBuilder[(String, String)]
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // hashed-output typing rule (FIXTURES.md, r12): the driver's
        // hasher canonicalizes DECIMAL values differently from the
        // local DuckDB (the r11 4-query breach) — fail the dump loudly
        // before a DECIMAL-typed result ships to the compare
        val dec = OracleAudit.decimalFields(df.schema)
        if (dec.nonEmpty) throw new IllegalStateException(
          s"$name emits DecimalType output (${dec.mkString(", ")}): " +
            "hashed outputs must be BIGINT/STRING/DATE/DOUBLE " +
            "(FIXTURES.md typing rule)")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors += name -> s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // negative-// audit over the FULL oracle map, run-then-dump oracles
    // included (OracleAuditSpec can only see the static subset): a
    // version-unportable division must fail the dump loudly, not ship
    // to the driver's DuckDB (the r10 stats_ols/ts_autocorr breach)
    val violations = OracleAudit.auditAll(SparkEntry.oracleSql)
    if (violations.nonEmpty)
      throw new IllegalStateException(
        "negative-division oracle audit failed (FIXTURES.md negative-// " +
          "rule):\n" + violations.mkString("\n"))
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.result()
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
  }
}
