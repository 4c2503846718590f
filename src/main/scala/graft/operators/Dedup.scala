package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashOps
import graft.functions.VectorOps
import graft.sources.Tables

/** Deduplication operators for a training-data pipeline, over the
  * `documents` (text) and `embeddings` (vector) tables. Extends the
  * reference's surface (it has no dedup; SURVEY.md §2 absent-table).
  *
  * Scale design notes (100 TB posture):
  *  - exact dedup groups on `md5(text)` so the shuffle carries a 32-byte
  *    key, never the document body;
  *  - n-gram Jaccard generates candidates through a shingle-equality
  *    join (shuffle keyed by shingle), with a document-frequency cap on
  *    shingles (df ≤ maxDf) so a stop-shingle can never produce a
  *    quadratic bucket — the classic common-token pruning;
  *  - MinHash/SimHash banding joins are the LSH scale path: candidates
  *    come from equality joins on short band keys, and only candidates
  *    pay the exact-verification cost;
  *  - all signatures are md5-based and deterministic → the DuckDB oracle
  *    reproduces the full pipeline (candidates included) exactly.
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column (1-based positions —
    * matches the DuckDB formulation `t[i] || ' ' || t[i+1] ...`). */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = split(text, " ")
    val grams = transform(sequence(lit(1), size(t) - (n - 1)), i =>
      concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*))
    array_distinct(when(size(t) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** (doc_id, sh) — exploded distinct shingles. */
  private def shingleRows(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(shingles(col("text"))).as("sh"))

  // ---------------------------------------------------------------- exact

  /** Exact dedup: one survivor (min doc_id) per identical text; shuffle
    * key is md5(text). Output: (doc_id, n_dups). */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("n_dups"))
      .orderBy("doc_id")

  // -------------------------------------------------- exact n-gram Jaccard

  /** Exact word-3-gram Jaccard over discriminative shingles (global
    * df ≤ maxDf): candidates share ≥1 such shingle; Jaccard is computed
    * over each document's restricted shingle set. Integer counts → the
    * score is exactly reproducible. Output pairs with j ≥ threshold. */
  def ngramJaccard(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, maxDf: Int = 50): DataFrame = {
    val sh = shingleRows(spark, sfDir)
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val shr = sh.join(rare, "sh")
    val sz = shr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = shr.as("a").join(shr.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    val j = (col("c") * lit(1.0)) / (col("na") + col("nb") - col("c"))
    pairs
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(j >= threshold)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------- MinHash

  val MINHASH_PERMS = 16
  val MINHASH_BANDS = 8 // 2 rows per band

  /** MinHash + LSH near-dup: 16 deterministic permutations (min of
    * md5(j || ':' || shingle) per j — lexicographic min of fixed-width
    * hex = numeric min), banded 8×2; docs sharing a band key become
    * candidates; candidates are verified with exact shingle Jaccard.
    * Fully deterministic → oracle-reproducible including recall misses. */
  def minhashLSH(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingleRows(spark, sfDir)
    val mh = sh
      .select(col("doc_id"), col("sh"),
        explode(sequence(lit(0), lit(MINHASH_PERMS - 1))).as("j"))
      .select(col("doc_id"), col("j"),
        md5(concat(col("j").cast("string"), lit(":"), col("sh")).cast("binary")).as("h"))
      .groupBy("doc_id", "j").agg(min("h").as("h"))
    val bk = mh
      .groupBy(col("doc_id"), floor(col("j") / 2.0).cast("long").as("band"))
      .agg(concat(
        min(when(col("j") % 2 === 0, col("h"))),
        min(when(col("j") % 2 === 1, col("h")))).as("key"))
    val cand = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(sh, cand, threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against the full
    * distinct shingle sets. */
  private def verifyJaccard(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ov = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh2")), "doc_b")
      .filter(col("sh") === col("sh2"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    val j = (col("c") * lit(1.0)) / (col("na") + col("nb") - col("c"))
    ov
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(j >= threshold)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------- SimHash

  val SIMHASH_BITS = 32
  val SIMHASH_BANDS = 4 // 8 bits per band

  /** 32-bit SimHash signature per document (token multiplicity counted):
    * bit b = sign of Σ_tokens (±1 by bit b of wordHash). Computed as 32
    * sequential folds over the per-row hash array — narrow, no shuffle.
    * Near-dup pairs via 4×8-bit band LSH + Hamming ≤ maxHamming. */
  def simhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    val hws = transform(split(col("text"), " "), w => HashOps.wordHash(w))
    val withH = Tables(spark, sfDir, "documents").select(col("doc_id"), hws.as("hws"))
    val bitCols = (0 until SIMHASH_BITS).map { b =>
      val s = aggregate(col("hws"), lit(0L), (acc, h) =>
        acc + (shiftright(h, b).bitwiseAND(lit(1L)) * 2 - 1))
      when(s > 0, lit("1")).otherwise(lit("0"))
    }
    withH.select(col("doc_id"), concat(bitCols: _*).as("sig"))
  }

  def simhashPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(spark, sfDir)
    val bandWidth = SIMHASH_BITS / SIMHASH_BANDS
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until SIMHASH_BANDS).map(b =>
        substring(col("sig"), b * bandWidth + 1, bandWidth)): _*)).as(Seq("band", "key")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.sig").as("sa"),
        col("b.doc_id").as("doc_b"), col("b.sig").as("sb"))
      .distinct()
    val hamming = aggregate(
      zip_with(split(col("sa"), ""), split(col("sb"), ""),
        (x, y) => when(x =!= y, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    cand.select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  // ----------------------------------------------------- embedding cosine

  /** Embedding-cosine near-dup pairs (cos ≥ threshold). Exact O(N²)
    * pairwise at test scale; the LSH-bucketed scale path is
    * [[Similarity.ivfTopK]]'s coarse quantization — at 100 TB, run
    * assignment first and only pair within buckets. */
  def cosineNearDup(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val p = Tables(spark, sfDir, "embeddings").select(
      col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cos = VectorOps.cosine(col("a.v"), col("b.v"))
    p.as("a").join(p.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), cos.as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")
  }
}
