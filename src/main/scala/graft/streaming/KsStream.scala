package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Incremental two-sample distribution monitor: the streaming twin of
  * [[Relational.statsKs]] (the 13th streaming=batch parity pair). Each
  * micro-batch contributes its per-cent-bin counts for both cohorts
  * ([[Relational.ksBinCounts]] — counts, so the merge is addition:
  * associative, commutative, slicing-independent), and the bin ledger
  * upserts via `foreachBatch` into versioned snapshot directories (the
  * [[EventStream.upsertSnapshot]] exactly-once pattern). The current KS
  * row is computed FROM the ledger on read ([[Relational.ksFromBins]],
  * the identical deterministic tail as the batch query), so stream and
  * batch cannot drift.
  *
  * This is the always-on face of the cohort drift test a data-quality
  * gate runs: the batch query answers "did these two cohorts differ";
  * the ledger answers it continuously as events arrive, with state
  * bounded by the value DOMAIN (the cent grid), not the corpus. */
object KsStream {

  /** Start the incremental bin ledger over a streaming events relation.
    * Ledger schema: `(x, ca, cb)`. Returns the streaming query (caller
    * stops it). */
  def monitorStream(spark: SparkSession, events: DataFrame, dir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val contrib = Relational.ksBinCounts(batch)
        val merged = EventStream.latestSnapshot(spark, dir,
          below = Some(batchId)) match {
          case None => contrib
          case Some(base) => base.unionByName(contrib)
            .groupBy("x")
            .agg(sum("ca").as("ca"), sum("cb").as("cb"))
        }
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current KS statistic — row-equal to [[Relational.statsKs]]
    * over the events ingested so far. */
  def currentKs(spark: SparkSession, dir: String): DataFrame =
    EventStream.latestSnapshot(spark, dir)
      .map(Relational.ksFromBins)
      .getOrElse(spark.emptyDataFrame)
}
