package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Incremental winnow near-dup index: the streaming twin of
  * [[graft.operators.Dedup.winnowPairs]] (the 12th streaming=batch
  * parity pair) — and the relation a production incremental near-dup
  * system actually maintains: a (fingerprint → posting list) ledger
  * over the winnowing fingerprints ([[TextAnalysis.winnow]], MOSS
  * SIGMOD 2003), updated per micro-batch as documents arrive.
  *
  * Each batch fingerprints its documents with the IDENTICAL derivation
  * as the batch operator ([[TextAnalysis.winnowRawOf]] — per-row, so a
  * document fingerprints the same in any slicing) and upserts the
  * per-fingerprint doc sets via `foreachBatch` into versioned snapshot
  * directories (the [[EventStream.upsertSnapshot]] exactly-once
  * pattern: idempotent `v=<batchId>` rewrites, `_SUCCESS`-gated reads).
  *
  * Boilerplate capping is part of the LEDGER, not just the view: a
  * fingerprint shared by more than `cap` documents is corpus
  * boilerplate ([[Dedup.winnowPairs]]'s stop-bucket guard) — its
  * posting list is dropped and the row marked `hot`, so per-key state
  * stays ≤ cap docs at any corpus size. Hotness is slicing-independent:
  * doc sets only ever grow, so "the accumulated distinct-doc count
  * exceeds cap" holds for the same fingerprints under any micro-batch
  * slicing (set union is associative/commutative), and once hot a key
  * stays hot.
  *
  * Scale note: each merge rewrites the full ledger (one fp shuffle of
  * ledger + batch contributions); at 100 TB the ledger is stored
  * bucketed by `fp` so a merge shuffles only the batch's contributions
  * — the merge logic is unchanged by that layout. */
object WinnowLedgerStream {

  /** Default boilerplate cap — [[Dedup.winnowPairs]]'s default. */
  val Cap = 50

  /** Start the incremental posting ledger over a streaming
    * `(doc_id, text)` relation. Ledger schema: `(fp, hot, ds)` with
    * `ds` the sorted distinct doc ids (empty once hot). Returns the
    * streaming query (caller stops it). */
  def ledgerStream(spark: SparkSession, docs: DataFrame, dir: String,
      cap: Int = Cap): org.apache.spark.sql.streaming.StreamingQuery = {
    docs.select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val posCap = 1L << 20
        val contrib = TextAnalysis.winnowRawOf(batch, 8, 4)
          .select(expr(s"sel div $posCap").as("fp"), col("doc_id"))
          .groupBy("fp")
          .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
          .withColumn("hot", lit(false))
        val all = EventStream.latestSnapshot(spark, dir,
          below = Some(batchId)) match {
          case None => contrib
          case Some(base) => base.unionByName(contrib)
        }
        val merged = all
          .groupBy("fp")
          .agg(max(col("hot")).as("was_hot"),
            sort_array(array_distinct(flatten(collect_list(col("ds"))))).as("dsu"))
          .withColumn("hot", col("was_hot") || size(col("dsu")) > cap)
          .select(col("fp"), col("hot"),
            when(col("hot"), array().cast("array<long>"))
              .otherwise(col("dsu")).as("ds"))
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current match-pair view over the ledger: expand every
    * non-boilerplate posting list with the SAME pair reduction as the
    * batch operator ([[Dedup.postingPairCounts]]) — row-equal to
    * [[Dedup.winnowPairs]] over the documents ingested so far. */
  def currentPairs(spark: SparkSession, dir: String,
      minShared: Long = 2): DataFrame =
    EventStream.latestSnapshot(spark, dir) match {
      case None => spark.emptyDataFrame
      case Some(ledger) =>
        Dedup.postingPairCounts(ledger.filter(!col("hot")), minShared)
    }
}
