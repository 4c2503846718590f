package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Incremental BPE sequence packer: the streaming twin of
  * [[graft.operators.Bpe.packSequencesBpe]]. Documents arrive as a
  * micro-batched append-only stream in ascending `doc_id` order (the
  * natural corpus-ingest contract — monotone ids); each batch is
  * tokenized with the FROZEN corpus-trained vocab (a production
  * tokenizer is fixed before ingest), its per-document token counts
  * take their place in the per-shard running prefix sum, and the
  * `(shard, seq)` packing ledger upserts via `foreachBatch` into
  * versioned snapshot directories — the
  * [[EventStream.upsertSnapshot]] exactly-once pattern.
  *
  * Carry-over state is the ledger itself: the per-shard cumulative
  * token count equals `sum(n_tokens)` over the shard's ledger rows, so
  * a batch's documents continue the prefix sum exactly where the last
  * batch stopped — no separate state store. A sequence that straddles
  * a batch boundary accumulates by SUM across the batches that touch
  * it; because packing is a prefix-sum partition, processing the same
  * ascending-id document sequence in ANY slicing yields the identical
  * ledger (parity-gated against the oracle-green batch
  * `pack_sequences_bpe` in StreamBatchParitySpec).
  *
  * Scale note: each merge rewrites the full ledger (seq-count-sized,
  * tiny — one row per packed sequence); the corpus-sized work
  * (tokenize) touches only the new batch. */
object PackLedgerStream {

  /** Start the incremental packer over a streaming `(doc_id, text)`
    * relation. Ledger schema: `(shard, seq, n_docs, n_tokens)`.
    * `sfDir` names the corpus whose frozen tokenizer to use. Returns
    * the streaming query (caller stops it). */
  def packStream(spark: SparkSession, docs: DataFrame, sfDir: String,
      dir: String, budget: Long = Bpe.BpeBudget, nShards: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val m = Bpe.model(spark, sfDir) // frozen BEFORE the stream starts
    docs.select(col("doc_id"), col("text"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val enc = Bpe.encodeDistinctWordsOf(batch, m).select("w", "n_tok")
        val docTok = batch
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .join(broadcast(enc), Seq("w"))
          .groupBy("doc_id").agg(sum("n_tok").as("n_tok"))
          .select(col("doc_id"),
            pmod(col("doc_id"), lit(nShards.toLong)).as("shard"), col("n_tok"))
        val base = EventStream.latestSnapshot(spark, dir, below = Some(batchId))
        // the shard's running token count so far IS the ledger's sum —
        // the prefix sum continues from it
        val carry = base match {
          case None => null
          case Some(b) => b.groupBy("shard").agg(sum("n_tokens").as("cum0"))
        }
        val w = Window.partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val withCum = docTok.withColumn("cumb", sum("n_tok").over(w))
        val offset =
          if (carry == null) withCum.withColumn("cum0", lit(0L))
          else withCum.join(broadcast(carry), Seq("shard"), "left")
            .na.fill(0L, Seq("cum0"))
        val contrib = offset
          .withColumn("seq", expr(s"(cum0 + cumb - n_tok) div $budget"))
          .groupBy("shard", "seq")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        val merged = base match {
          case None => contrib
          case Some(b) => b.unionByName(contrib)
            .groupBy("shard", "seq")
            .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"))
        }
        merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
        ()
      }
      .start()
  }

  /** The current packing view of the ledger — row-equal to
    * [[Bpe.packSequencesBpe]] over the documents ingested so far. */
  def currentPacking(spark: SparkSession, dir: String): DataFrame =
    EventStream.latestSnapshot(spark, dir)
      .map(_.orderBy("shard", "seq"))
      .getOrElse(spark.emptyDataFrame)
}
