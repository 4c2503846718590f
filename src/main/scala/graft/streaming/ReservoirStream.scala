package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Pipeline

/** Incremental weighted reservoir: the streaming twin of
  * [[graft.operators.Pipeline.weightedSample]]. Documents arrive as a
  * micro-batched stream; each batch scores its documents with the
  * IDENTICAL rational-priority builder as the batch operator
  * ([[Pipeline.weightedPriorities]] — priorities depend only on the
  * row, never on arrival), reduces to its own bottom-k, and merges
  * into a k-row running reservoir via `foreachBatch` versioned
  * snapshots — the [[EventStream.upsertSnapshot]] exactly-once pattern
  * (idempotent `v=<batchId>` rewrites, `_SUCCESS`-gated reads).
  *
  * Slicing independence: bottom-k under a total order is ASSOCIATIVE
  * and COMMUTATIVE (min-k of a union = min-k of per-part min-ks), so
  * the final reservoir equals the single-shot batch sample under ANY
  * micro-batch slicing — parity-gated in StreamBatchParitySpec. This
  * is the streaming face of distributed reservoir sampling: every
  * executor/batch keeps k candidates, merges are k-row.
  *
  * Scale note: the ledger is k rows; each merge unions k + k rows and
  * re-heaps — constant work per batch regardless of corpus size. */
object ReservoirStream {

  /** Start the incremental weighted reservoir over a streaming
    * `(doc_id, text)` relation. Ledger schema: `(doc_id, w, priority)`.
    * Returns the streaming query (caller stops it). */
  def reservoirStream(spark: SparkSession, docs: DataFrame, dir: String,
      k: Int = Pipeline.WEIGHTED_K)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val contrib = Pipeline.weightedPriorities(batch)
          .orderBy(asc("priority"), asc("doc_id")).limit(k)
        val merged = EventStream.latestSnapshot(spark, dir,
          below = Some(batchId)) match {
          case None => contrib
          case Some(base) => base.unionByName(contrib)
            .orderBy(asc("priority"), asc("doc_id")).limit(k)
        }
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current ranked sample — row-equal to
    * [[Pipeline.weightedSample]] over the documents ingested so far. */
  def currentSample(spark: SparkSession, dir: String,
      k: Int = Pipeline.WEIGHTED_K): DataFrame =
    EventStream.latestSnapshot(spark, dir) match {
      case None => spark.emptyDataFrame
      case Some(ledger) => Pipeline.rankReservoir(ledger, k)
    }
}
