package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Test-only fixture writer for the file-source streaming specs: stages a
  * single top-level parquet FILE (the file stream source does not recurse
  * into subdirectories) whose `ts` column — supplied as raw NANOSECOND
  * longs — is re-encoded to match whatever parquet already sits in the
  * destination dir. Spec-written batches therefore stay readable under
  * one stream schema no matter which ts encoding the regenerated
  * fixtures use (TIMESTAMP(NANOS)-as-long historically, TIMESTAMP_NTZ
  * micros currently — the r7 regen crashed the hardcoded-Long specs). */
object StreamTestData {

  def writeEventsFile(spark: SparkSession, destDir: String, name: String,
      nanoTsRows: DataFrame, mtime: Option[Long] = None): Unit = {
    val target =
      try spark.read.parquet(destDir).schema("ts").dataType
      catch { case _: Throwable => EventStream.rawSchema("ts").dataType }
    val encoded = target match {
      case LongType => nanoTsRows
      case TimestampNTZType => nanoTsRows.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => nanoTsRows.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
    val stage = Files.createTempDirectory("graft_stage").toString
    encoded.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(s"$destDir/$name"))
    mtime.foreach(new java.io.File(s"$destDir/$name").setLastModified(_))
  }
}
