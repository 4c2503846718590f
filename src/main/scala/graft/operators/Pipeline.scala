package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashOps
import graft.sources.Tables

/** Training-data pipeline operators over `documents`: token-budget
  * sequence packing, PII scrubbing, and stratified sampling. Extends the
  * reference's surface (SURVEY.md §2 absent-table — it ships raw CSV
  * points straight into the fit); these are the preparation steps an
  * LLM-scale corpus needs before any clustering/training pass.
  *
  * All three are deterministic (md5-derived hashes, fixed regexes), so
  * the DuckDB oracle reproduces them exactly.
  */
object Pipeline {

  /** Token-budget sequence packing (GPT-style concat-and-chunk
    * accounting): documents are sharded, concatenated in deterministic
    * order within each shard, and split at `budget`-token boundaries; a
    * document belongs to the sequence its first token lands in. Output:
    * per (shard, seq) document and token counts.
    *
    * Scale: the prefix sum is the only inherently sequential step, so it
    * runs per shard — one window partition each, never a global
    * ordering. `nShards` scales with the cluster (at 100 TB you'd use
    * ~10k shards so each shard's documents fit one task's sort); shards
    * pack independently, which is exactly how production packing runs.
    */
  def packSequences(spark: SparkSession, sfDir: String,
      budget: Long = 2048L, nShards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      // integer floor division — `div`, never Column '/' (double
      // roundtrip + truncation; see Joins.interval)
      .withColumn("seq", expr(s"(cum - n_tok) div $budget"))
      .groupBy("shard", "seq")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("shard", "seq")
  }

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+[0-9]+ \\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"

  /** PII scrub: count and redact email addresses and phone numbers.
    * The synthetic corpus carries no PII, so the query plants a
    * deterministic contact line on a subset of documents first (emails on
    * doc_id % 3 != 0, phones on even doc_id) — the redaction counts then
    * prove the patterns actually fire, and the md5 of the scrubbed text
    * pins the replacement output exactly.
    *
    * Narrow per-row projection — no shuffle; at 100 TB this runs at scan
    * speed. Regexes stay in conservative char-class form so Java and the
    * oracle's RE2-style engine agree. */
  def piiScrub(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    val aug = concat(col("text"),
      when(pmod(id, lit(3L)) > 0,
        concat(lit(" contact user"), id.cast("string"), lit("@mail.example")))
        .otherwise(lit("")),
      when(pmod(id, lit(2L)) === 0,
        concat(lit(" call +1 (555) 010-"),
          lpad(pmod(id, lit(10000L)).cast("string"), 4, "0")))
        .otherwise(lit("")))
    val scrubbed = regexp_replace(
      regexp_replace(aug, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    Tables(spark, sfDir, "documents")
      .select(id,
        regexp_count(aug, lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(aug, lit(PhoneRe)).cast("long").as("n_phones"),
        md5(scrubbed.cast("binary")).as("clean_hash"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[piiScrub]] (regexp_replace needs the 'g' flag;
    * counts via regexp_extract_all). */
  def piiScrubOracle: String = {
    val aug = "text || CASE WHEN doc_id % 3 <> 0 THEN " +
      "' contact user' || doc_id || '@mail.example' ELSE '' END || " +
      "CASE WHEN doc_id % 2 = 0 THEN ' call +1 (555) 010-' || " +
      "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    s"""WITH a AS (SELECT doc_id, $aug AS aug FROM documents)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(aug, '$EmailRe')) AS BIGINT) AS n_emails,
       |       CAST(len(regexp_extract_all(aug, '$PhoneRe')) AS BIGINT) AS n_phones,
       |       md5(regexp_replace(regexp_replace(aug, '$EmailRe', '<EMAIL>', 'g'),
       |                          '$PhoneRe', '<PHONE>', 'g')) AS clean_hash
       |FROM a ORDER BY doc_id""".stripMargin
  }

  /** Per-language sampling rates in permille — upsample rare languages,
    * downsample the dominant one (the standard corpus-balancing move). */
  val StratPermille: Seq[(String, Long)] =
    Seq("en" -> 100L, "zh" -> 500L, "es" -> 300L, "de" -> 300L, "fr" -> 200L)
  val StratDefault = 250L

  /** Stratified deterministic sampling: keep a document iff the first 15
    * md5 nibbles of "strat:<doc_id>" fall under its language's permille
    * rate. Same idea as [[TextAnalysis.hashSample]] but with per-stratum
    * rates — reproducible (no RNG state), stable under re-partitioning
    * and task retries, and a narrow filter that pushes to the scan. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val rate = coalesce(
      element_at(
        map(StratPermille.flatMap { case (l, r) => Seq(lit(l), lit(r)) }: _*),
        col("lang")),
      lit(StratDefault))
    Tables(spark, sfDir, "documents")
      .filter(pmod(
        HashOps.wordHashN(concat(lit("strat:"), col("doc_id").cast("string")), 15),
        lit(1000L)) < rate)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** C4-style cleaning funnel: the composite filter chain a real corpus
    * runs before training — length window, heuristic quality threshold,
    * language-ID confidence, exact-dedup survivorship — reported as a
    * survival funnel (docs and tokens remaining after each cumulative
    * stage).
    *
    * One pass computes every per-doc signal (narrow, codegen'd, reusing
    * [[TextAnalysis]] kernels); the dedup survivor flag is a min-over
    * md5(text) window (shuffle keyed by the 32-byte hash, never the
    * body); the funnel itself is an explode of 5 stage structs + one
    * hash aggregate. At 100 TB: one shuffle of (hash, id) pairs, one
    * aggregate — everything else reads at scan speed. */
  def cleanCorpus(spark: SparkSession, sfDir: String, minTok: Long = 20L,
      maxTok: Long = 1000L, minScore: Double = 0.5): DataFrame = {
    val byText = Window.partitionBy(md5(col("text").cast("binary")))
    val d = Tables(spark, sfDir, "documents").select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      TextAnalysis.qualityScore(col("text")).as("score"),
      TextAnalysis.langPred(col("text")).as("lp"),
      min("doc_id").over(byText).as("keeper"))
    val lenOk = col("n_tok") >= minTok && col("n_tok") <= maxTok
    val qOk = lenOk && col("score") >= minScore
    val langOk = qOk && col("lp") =!= "und"
    val dedupOk = langOk && col("keeper") === col("doc_id")
    val stages = array(Seq(
      (1L, "all", lit(true)), (2L, "length", lenOk), (3L, "quality", qOk),
      (4L, "language", langOk), (5L, "dedup", dedupOk)).map { case (i, n, c) =>
      struct(lit(i).as("stage"), lit(n).as("name"), c.as("pass"))
    }: _*)
    d.select(explode(stages).as("s"), col("n_tok"))
      .filter(col("s.pass"))
      .groupBy(col("s.stage").as("stage"), col("s.name").as("name"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy("stage")
  }

  /** DuckDB twin of [[stratifiedSample]]. */
  def stratifiedSampleOracle: String = {
    val cases = StratPermille
      .map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang, ${HashOps.wordHashSqlN(15)} AS hk,
       |         CASE lang $cases ELSE $StratDefault END AS rate
       |  FROM (SELECT doc_id, lang, md5('strat:' || doc_id) AS m FROM documents))
       |WHERE hk % 1000 < rate ORDER BY doc_id""".stripMargin
  }
}
