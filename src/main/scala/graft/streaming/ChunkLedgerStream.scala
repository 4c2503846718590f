package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental CDC chunk-store ledger: the streaming twin of
  * [[graft.operators.Dedup.chunkDupGroups]]. New documents arrive as a
  * micro-batched stream; each batch is content-defined-chunked with the
  * IDENTICAL boundary rule as the batch operator
  * ([[Dedup.cdcChunkRowsFrom]] — cut points depend only on local
  * content, so a document chunks the same whether it arrives in a batch
  * load or a stream), its per-chunk contributions aggregate, and the
  * running ledger upserts via `foreachBatch` into versioned snapshot
  * directories — the [[EventStream.upsertSnapshot]] exactly-once
  * pattern (idempotent `v=<batchId>` rewrites, `_SUCCESS`-gated reads,
  * reader takes the max committed version).
  *
  * Additivity: a document is chunked exactly once (append-only corpus
  * stream, each doc in one micro-batch), so per-chunk doc and
  * occurrence counts merge by SUM and chunk length by MAX — the merge
  * is associative and the final ledger is independent of micro-batch
  * slicing (parity-gated in StreamBatchParitySpec). Keys are the full
  * md5 `chunk_key` ([[Dedup.chunkDupGroups]]'s 100 TB collision
  * posture).
  *
  * Scale note: like the upsert snapshot, each merge rewrites the full
  * ledger (one chunk_key shuffle of ledger + batch contributions); at
  * 100 TB the ledger side is stored bucketed by `chunk_key` so a merge
  * shuffles only the batch's contributions — the merge logic is
  * unchanged by that layout. */
object ChunkLedgerStream {

  /** Start the incremental ledger over a streaming `(doc_id, text)`
    * relation. Ledger schema: `(chunk_key, chunk_len, n_docs, n_occ)`
    * with the same `minLen` admission as the batch operator. Returns
    * the streaming query (caller stops it). */
  def ledgerStream(spark: SparkSession, docs: DataFrame, dir: String,
      minLen: Long = Dedup.CdcMinDupLen)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val contrib = Dedup.cdcChunkRowsFrom(batch)
          .filter(col("chunk_len") >= minLen)
          .groupBy("chunk_key", "doc_id")
          .agg(count(lit(1)).as("occ"), max("chunk_len").as("cl"))
          .groupBy("chunk_key")
          .agg(max("cl").as("chunk_len"), count(lit(1)).as("n_docs"),
            sum("occ").as("n_occ"))
        val merged = EventStream.latestSnapshot(spark, dir,
          below = Some(batchId)) match {
          case None => contrib
          case Some(base) => base.unionByName(contrib)
            .groupBy("chunk_key")
            .agg(max("chunk_len").as("chunk_len"), sum("n_docs").as("n_docs"),
              sum("n_occ").as("n_occ"))
        }
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current duplicate-chunk view of the ledger — row-equal to
    * [[Dedup.chunkDupGroups]] over the documents ingested so far. */
  def currentDupGroups(spark: SparkSession, dir: String): DataFrame =
    EventStream.latestSnapshot(spark, dir)
      .map(_.filter(col("n_docs") >= 2)
        .orderBy(desc("n_occ"), desc("n_docs"), col("chunk_key")))
      .getOrElse(spark.emptyDataFrame)
}
