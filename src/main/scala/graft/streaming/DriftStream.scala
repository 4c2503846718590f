package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Incremental distribution-drift monitor: the streaming twin of
  * [[Relational.dqDrift]]. Events arrive as a micro-batched stream;
  * each batch contributes its per-grid-bin counts for both comparison
  * windows ([[Relational.driftBinCounts]] — counts, so the merge is
  * addition: associative, commutative, slicing-independent), and the
  * bin ledger upserts via `foreachBatch` into versioned snapshot
  * directories — the [[EventStream.upsertSnapshot]] exactly-once
  * pattern. The current KS statistic is computed FROM the ledger on
  * read ([[Relational.driftFromBins]], the identical deterministic
  * tail as the batch query), so stream and batch cannot drift.
  *
  * Scale note: the ledger is grid-sized (bounded by the value RANGE,
  * not the corpus); each merge rewrites it wholesale — trivial at any
  * corpus scale. */
object DriftStream {

  /** Start the incremental bin ledger over a streaming events relation.
    * Ledger schema: `(v, ca, cb)`. Returns the streaming query (caller
    * stops it). */
  def monitorStream(spark: SparkSession, events: DataFrame, dir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val contrib = Relational.driftBinCounts(batch)
        val merged = EventStream.latestSnapshot(spark, dir,
          below = Some(batchId)) match {
          case None => contrib
          case Some(base) => base.unionByName(contrib)
            .groupBy("v")
            .agg(sum("ca").as("ca"), sum("cb").as("cb"))
        }
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current drift report — row-equal to [[Relational.dqDrift]]
    * over the events ingested so far. */
  def currentDrift(spark: SparkSession, dir: String): DataFrame =
    EventStream.latestSnapshot(spark, dir)
      .map(Relational.driftFromBins)
      .getOrElse(spark.emptyDataFrame)
}
