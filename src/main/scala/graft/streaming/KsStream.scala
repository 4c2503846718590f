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
    * stops it).
    *
    * Restart semantics (ADVICE r13): WITH `checkpoint`, a restarted
    * query resumes source offsets and batchIds from the checkpoint, so
    * the idempotent `v=<batchId>` rewrites line up with the existing
    * snapshots — the restartable production mode. WITHOUT it (the
    * ephemeral test mode) batchIds restart at 0 while stale
    * higher-numbered `v=` snapshots from a prior run would out-version
    * every new batch — [[currentKs]] reads the global max version, so
    * it would serve the stale ledger and double-count once new batchIds
    * catch up; the start therefore CLEARS any existing snapshots in
    * `dir` so an uncheckpointed query always begins from an empty
    * ledger. */
  def monitorStream(spark: SparkSession, events: DataFrame, dir: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    if (checkpoint.isEmpty) EventStream.clearSnapshots(spark, dir)
    val w = events.writeStream
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
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** The current KS statistic — row-equal to [[Relational.statsKs]]
    * over the events ingested so far. */
  def currentKs(spark: SparkSession, dir: String): DataFrame =
    EventStream.latestSnapshot(spark, dir)
      .map(Relational.ksFromBins)
      .getOrElse(spark.emptyDataFrame)
}
