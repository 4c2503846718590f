package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Incremental data-quality monitor: the streaming twin of
  * [[graft.operators.Relational.dqExpectations]] over an ingest stream
  * of fact rows. Each micro-batch evaluates the identical rule
  * predicates ([[Relational.dqStreamableRows]] — the five row-local
  * rules plus the anti-join referential check against the STATIC
  * dimension, the stream-static join Structured Streaming plans
  * natively) and the running per-rule counters upsert via `foreachBatch`
  * into versioned snapshots — the [[EventStream.upsertSnapshot]]
  * exactly-once pattern (idempotent `v=<batchId>` rewrites,
  * `_SUCCESS`-gated reads).
  *
  * Slicing independence: every counter is a sum over input rows and the
  * merge is addition — associative and commutative — so the final
  * report is independent of micro-batch slicing (parity-gated equal to
  * the oracle-green batch query in StreamBatchParitySpec). The
  * orders-uniqueness rule is deliberately absent: it is a property of
  * the dimension table, not of the streamed fact rows.
  *
  * This is the shape a 100 TB ingest runs quality gates in production:
  * rules evaluate on arrival (counters are micro-batch-local
  * aggregates, never a re-scan of history), and the monitor's ledger is
  * rule-count-sized — bytes, regardless of corpus size. */
object DqStream {

  /** Start the incremental rule-counter ledger over a streaming
    * lineitem relation. Ledger schema:
    * `(rule, n_checked, n_violations)`. Returns the streaming query
    * (caller stops it). */
  def monitorStream(spark: SparkSession, li: DataFrame, orders: DataFrame,
      dir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    li.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val contrib = Relational.dqStreamableRows(batch, orders)
        val merged = EventStream.latestSnapshot(spark, dir,
          below = Some(batchId)) match {
          case None => contrib
          case Some(base) => base.unionByName(contrib)
            .groupBy("rule")
            .agg(sum("n_checked").as("n_checked"),
              sum("n_violations").as("n_violations"))
        }
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current quality report: the accumulated counters with the
    * batch query's pass flag — row-equal to the streamable subset of
    * [[Relational.dqExpectations]] over the rows ingested so far. */
  def currentReport(spark: SparkSession, dir: String): DataFrame =
    EventStream.latestSnapshot(spark, dir) match {
      case None => spark.emptyDataFrame
      case Some(ledger) => ledger
        .withColumn("pass", when(col("n_violations") === 0L, 1L).otherwise(0L))
        .orderBy("rule")
    }
}
