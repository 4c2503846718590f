package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental passage-dedup ledger: the streaming twin of
  * [[graft.operators.Dedup.passageDedup]]. New documents arrive as a
  * micro-batched stream; each batch blocks with the IDENTICAL
  * fixed-width rule as the batch operator ([[Dedup.passageBlocksOf]] —
  * blocking depends only on the row, so a document blocks the same
  * whether it arrives in a batch load or a stream), and the running
  * ledger of per-block-hash FIRST occurrences upserts via `foreachBatch`
  * into versioned snapshot directories — the
  * [[EventStream.upsertSnapshot]] exactly-once pattern (idempotent
  * `v=<batchId>` rewrites, `_SUCCESS`-gated reads, reader takes the max
  * committed version).
  *
  * Slicing independence: the batch semantics key "first" on the GLOBAL
  * (doc_id, blk_idx) order, not arrival order, and lexicographic MIN
  * over (doc_id, blk_idx) is associative/commutative — so the final
  * ledger is independent of micro-batch slicing (parity-gated in
  * StreamBatchParitySpec), unlike the deliberately arrival-ordered
  * [[SemanticDedupStream]]. Keys are the full md5 of the block — the
  * [[Dedup.chunkDupGroups]] 100 TB collision posture.
  *
  * Scale note: each merge rewrites the full ledger (one blk_key shuffle
  * of ledger + batch firsts); at 100 TB the ledger is stored bucketed by
  * `blk_key` so a merge shuffles only the batch's contributions — the
  * merge logic is unchanged by that layout. */
object PassageLedgerStream {

  /** Start the incremental first-occurrence ledger over a streaming
    * `(doc_id, text)` relation. Ledger schema:
    * `(blk_key, first_doc, first_idx)`. Returns the streaming query
    * (caller stops it). */
  def ledgerStream(spark: SparkSession, docs: DataFrame, dir: String,
      blockWords: Int = Dedup.PASSAGE_WORDS)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val contrib = Dedup.passageBlocksOf(batch, blockWords)
          .groupBy(md5(col("blk").cast("binary")).as("blk_key"))
          .agg(min(struct(col("doc_id"), col("blk_idx"))).as("first"))
          .select(col("blk_key"), col("first.doc_id").as("first_doc"),
            col("first.blk_idx").as("first_idx"))
        val merged = EventStream.latestSnapshot(spark, dir,
          below = Some(batchId)) match {
          case None => contrib
          case Some(base) => base.unionByName(contrib)
            .groupBy("blk_key")
            .agg(min(struct(col("first_doc"), col("first_idx"))).as("first"))
            .select(col("blk_key"), col("first.first_doc").as("first_doc"),
              col("first.first_idx").as("first_idx"))
        }
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current per-doc survival view: the ingested corpus's blocks
    * joined to the ledger, keep ⇔ the block IS its hash's recorded
    * first occurrence — row-equal to [[Dedup.passageDedup]] over the
    * documents ingested so far. */
  def currentSummary(spark: SparkSession, dir: String, docs: DataFrame,
      blockWords: Int = Dedup.PASSAGE_WORDS): DataFrame =
    EventStream.latestSnapshot(spark, dir) match {
      case None => spark.emptyDataFrame
      case Some(ledger) =>
        val flagged = Dedup.passageBlocksOf(docs, blockWords)
          .withColumn("blk_key", md5(col("blk").cast("binary")))
          .join(ledger, Seq("blk_key"))
          .withColumn("keep",
            col("doc_id") === col("first_doc") && col("blk_idx") === col("first_idx"))
        Dedup.passageSummaryOf(flagged)
    }
}
