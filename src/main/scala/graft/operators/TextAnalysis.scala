package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the `documents` table. The reference has no text surface (SURVEY.md §2
  * absent-table) — these extend the engine per the build contract.
  *
  * Scale posture: every operator here is a NARROW per-row projection
  * (split / filter / transform / aggregate higher-order functions — all
  * inside whole-stage codegen, no UDFs, no shuffle, no join). At 100 TB
  * they read parquet, prune to (doc_id, text), and stream. Lexicons are
  * plan literals (tiny), never a join side.
  *
  * Every kernel is defined so the DuckDB oracle can reproduce it exactly:
  * integer counts, md5-derived hashes (identical lowercase-hex semantics
  * in Spark and DuckDB), and fixed-order arithmetic.
  */
object TextAnalysis {

  // ---------------------------------------------------------- language id

  /** Tiny per-language marker lexicons (deterministic heuristic). CASE
    * evaluation order = lexicographic lang code = tie-break. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "is", "it"),
    "es" -> Seq("el", "la", "los", "que", "una", "por"),
    "fr" -> Seq("le", "les", "des", "une", "dans"))

  private def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens contained in a literal word set — a narrow
    * filter-length over the token array, no shuffle. */
  private def hitCount(text: Column, words: Seq[String]): Column = {
    val lex = array(words.map(lit): _*)
    size(filter(tokens(text), t => array_contains(lex, t))).cast("long")
  }

  /** Predicted language of a text column — the [[langId]] argmax as a
    * reusable narrow expression (lexicographic tie-break, 'und' when no
    * lexicon hits). */
  private[operators] def langPred(text: Column): Column = {
    val scores = lexicons.map { case (l, ws) => (l, hitCount(text, ws)) }
    val m = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, sc), els) =>
      when(sc === m && m > 0, lit(l)).otherwise(els)
    }
  }

  /** The [[quality]] score as a reusable narrow expression (round-6, the
    * oracle-exact form). */
  private[operators] def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("long")
    val nPunct = (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
      .cast("long")
    val nChar = length(text).cast("long")
    round(least(lit(1.0), nTok / 100.0) * 0.4
      + (lit(1.0) - nPunct / nChar) * 0.3
      + least(lit(1.0), hitCount(text, stopwords) * 5.0 / nTok) * 0.3, 6)
  }

  /** N-gram/stopword-profile language ID: per-language marker-hit counts,
    * argmax with lexicographic tie-break, 'und' when no lexicon hits. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables(spark, sfDir, "documents")
    val scored = docs.select(
      col("doc_id") +:
        lexicons.map { case (lang, ws) => hitCount(col("text"), ws).as(s"s_$lang") }: _*)
    val m = greatest(lexicons.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = lexicons.foldRight(lit("und")) { case ((l, _), els) =>
      when(col(s"s_$l") === m && m > 0, lit(l)).otherwise(els)
    }
    // foldRight builds: de first → lexicographic-first wins ties
    scored.select(
      (col("doc_id") +: lexicons.map { case (l, _) => col(s"s_$l") }) :+
        pred.as("lang_pred"): _*)
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- quality scoring

  val stopwords: Seq[String] = lexicons.toMap.apply("en")

  /** Heuristic quality score from length / punctuation / stopword ratios.
    * All components are integer counts (exact), combined by a fixed
    * formula and rounded to 6. */
  def quality(spark: SparkSession, sfDir: String): DataFrame = {
    Tables(spark, sfDir, "documents").select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tok"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .cast("long").as("n_punct"),
      hitCount(col("text"), stopwords).as("stop_hits"),
      length(col("text")).cast("long").as("n_char"))
      .select(col("doc_id"), col("n_tok"), col("n_punct"), col("stop_hits"),
        round(least(lit(1.0), col("n_tok") / 100.0) * 0.4
          + (lit(1.0) - col("n_punct") / col("n_char")) * 0.3
          + least(lit(1.0), col("stop_hits") * 5.0 / col("n_tok")) * 0.3, 6)
          .as("score"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------- token counting

  /** BPE-ish pre-tokenizer regex: letter runs, digit runs, single
    * non-alphanumeric marks. Identical semantics in Java regex and RE2. */
  val bpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents").select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(bpeIshPattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")

  // ------------------------------------------------------- corpus statistics

  /** Corpus vocabulary statistics: per token, document frequency and
    * collection frequency — the df table every dedup/quality pipeline
    * needs. One explode + one hash aggregate (map-side partials); top-100
    * by cf with lexicographic tie-break keeps the result bounded. */
  def vocab(spark: SparkSession, sfDir: String, topN: Int = 100): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("w")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))
      .orderBy(desc("cf"), asc("w"))
      .limit(topN)

  /** Corpus character-trigram profile: the language-ID building block
    * (char n-gram distributions) as a first-class query — top-N trigrams
    * by frequency. One narrow explode of per-row substrings + one hash
    * aggregate; no tokenizer dependence. Short texts guard to an empty
    * list (Spark `sequence` DESCENDS when stop < start). */
  def charTrigrams(spark: SparkSession, sfDir: String, topN: Int = 30): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    // native one-pass window kernel: the transform(sequence, substr)
    // form is O(len²) in UTF-8 boundary seeks ([[graft.plans.CharGrams]])
    val grams = column(graft.plans.CharGrams(expression(col("text")), 3))
    Tables(spark, sfDir, "documents")
      .select(explode(grams).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cf"))
      .orderBy(desc("cf"), asc("g"))
      .limit(topN)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003
    * — the MOSS local fingerprinting algorithm): hash every k-char
    * gram, slide a w-gram window, and per FULL window select the
    * minimal hash — RIGHTMOST position on ties, the paper's rule;
    * distinct selections are the document's fingerprints. Guarantees at
    * least one fingerprint in every w consecutive grams, so any shared
    * substring of length ≥ w+k−1 is always detected — the robust middle
    * ground between exact window stats ([[graft.operators.Dedup
    * .substringDupStats]]) and whole-document hashes ([[fingerprint]]).
    *
    * Determinism device: the (hash, rightmost-pos) argmin packs into
    * ONE BIGINT — hm·2^20 + (2^20−1−pos), hm the 40-bit word hash — so
    * the frame reduction is an integer MIN both engines evaluate
    * identically and the fingerprint + position decode back out of the
    * packed value. Positions cap at 2^20 grams/doc (filtered
    * identically on both sides; the fixtures max far below).
    *
    * Scale shape: one narrow gram pass (native [[graft.plans.CharGrams]]
    * kernel), one per-doc window (the only shuffle, keyed by doc_id),
    * one distinct. Expected fingerprint density is 2/(w+1) of the gram
    * stream — the index a 100 TB near-dup system actually stores. */
  def winnow(spark: SparkSession, sfDir: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    val posCap = (1L << 20) - 1
    winnowSelections(spark, sfDir, k, w)
      .select(col("doc_id"),
        expr(s"sel div ${posCap + 1}").as("fp"),
        (lit(posCap) - pmod(col("sel"), lit(posCap + 1))).as("fp_pos"))
      .orderBy("doc_id", "fp_pos", "fp")
  }

  /** [[winnow]]'s core: the distinct packed (fingerprint, rightmost
    * position) selections per document, UNordered and UNdecoded.
    * MATERIALIZED per (sfDir, k, w) (r12 judge task 1): the gram+window
    * corpus pass behind it is the single most expensive relation in the
    * surface (~190-200 s per consumer at sf10) and BOTH `text_winnow`
    * and `dedup_winnow` derive from it — one fingerprint-density write
    * (≈ 2/(w+1) of the gram stream after the distinct) replaces two
    * identical corpus-sized passes. This IS the fingerprint index a
    * 100 TB near-dup system persists: built once per corpus, read by
    * every match/report query against it. */
  private[operators] def winnowSelections(spark: SparkSession,
      sfDir: String, k: Int, w: Int): DataFrame =
    graft.sources.Scratch.materialize(spark, s"winnow:$k:$w:${graft.sources.Scratch.corpusKey(sfDir)}") {
      winnowRaw(spark, sfDir, k, w).distinct()
    }

  /** The winnow window's raw per-gram selections `(doc_id, sel)` —
    * NOT yet deduplicated (adjacent windows select the same packed
    * value repeatedly). Query consumers go through
    * [[winnowSelections]]'s materialized distinct index instead of
    * re-running this corpus-sized pass. */
  private[operators] def winnowRaw(spark: SparkSession,
      sfDir: String, k: Int, w: Int): DataFrame =
    // r17: widened scan (guide §2.5) — the per-position fingerprint
    // hash runs scan-side and the fixture layout provides fewer scan
    // tasks than cores
    winnowRawOf(Tables.documentsWide(spark, sfDir), k, w)

  /** [[winnowRaw]] over an explicit `(doc_id, text)` relation — the
    * per-row fingerprint derivation depends only on the row, so a
    * document fingerprints identically whether it arrives in a batch
    * load or a micro-batch (the streaming-twin contract; consumed by
    * [[graft.streaming.WinnowLedgerStream]]). */
  private[graft] def winnowRawOf(docs: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import org.apache.spark.sql.expressions.Window
    val posCap = (1L << 20) - 1
    val grams = column(graft.plans.CharGrams(expression(col("text")), k))
    val g = docs
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "g")))
      .filter(col("pos") < posCap)
      .select(col("doc_id"), col("pos"),
        (pmod(graft.functions.HashOps.wordHashN(col("g"), 15), lit(1L << 40)) * lit(posCap + 1)
          + (lit(posCap) - col("pos"))).as("packed"))
    val byDoc = Window.partitionBy("doc_id")
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(0, w - 1)
    g.withColumn("cnt", count(lit(1)).over(byDoc))
      .withColumn("sel", min("packed").over(frame))
      .filter(col("pos") <= col("cnt") - w)
      .select(col("doc_id"), col("sel"))
  }

  /** DuckDB CTE chain (no leading WITH) ending in
    * `wfp(doc_id, fp, fp_pos)` — the winnow fingerprint relation at
    * [[winnow]]'s defaults (k=8, w=4, 40-bit hash, rightmost-min
    * packing). Shared by the `text_winnow` and `dedup_winnow` oracles
    * so both replay the identical fingerprint derivation. */
  def winnowOracleCtes: String = {
    import graft.functions.HashOps
    s"""g0 AS (SELECT doc_id,
       |         CASE WHEN length(text) >= 8
       |              THEN list_transform(generate_series(1, length(text) - 7),
       |                                  i -> substring(text, i, 8))
       |              ELSE [] END AS gs
       |       FROM documents),
       |g1 AS (SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos, unnest(gs) AS g FROM g0),
       |gh AS (SELECT doc_id, pos,
       |              ((${HashOps.wordHashSqlN(15)}) % 1099511627776) * 1048576
       |                + (1048575 - pos) AS packed
       |       FROM (SELECT doc_id, pos, md5(g) AS m FROM g1 WHERE pos < 1048575)),
       |w AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY doc_id) AS cnt,
       |             min(packed) OVER (PARTITION BY doc_id ORDER BY pos
       |                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
       |      FROM gh),
       |f AS (SELECT DISTINCT doc_id, sel FROM w WHERE pos <= cnt - 4),
       |wfp AS (SELECT doc_id, CAST(sel // 1048576 AS BIGINT) AS fp,
       |               CAST(1048575 - (sel % 1048576) AS BIGINT) AS fp_pos
       |        FROM f)""".stripMargin
  }

  /** TF-IDF top-k terms per document. idf is the rational N/df (NOT
    * log-scaled: ln is libm-dependent and not bit-portable across
    * engines — FIXTURES.md §C; the induced ranking is identical for
    * fixed N). Two hash aggregates (doc-term tf, corpus df), one join
    * shuffled on the term, one per-doc top-k window. At scale the df
    * table is vocabulary-sized → broadcastable. */
  def tfidfTopK(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
    // tf is distinct on (doc_id, w), so document frequency is a second
    // tiny aggregate over tf — NOT a second tokenize+distinct pass over
    // the corpus (tokenization is a lambda HOF: it never CSEs across
    // plan branches, so the old tok.distinct() re-read every document).
    // tf is persisted because both the join and df branch from it.
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n = Tables(spark, sfDir, "documents").count()
    val win = Window.partitionBy("doc_id").orderBy(desc("score"), asc("w"))
    tf.join(df, "w")
      .withColumn("score", col("tf") * lit(n.toDouble) / col("df"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("w"), col("tf"), col("df"),
        round(col("score"), 6).as("score"))
      .orderBy("doc_id", "rank")
  }

  /** Word-bigram language-model counts: top-N adjacent token pairs with
    * the conditional probability P(w2|w1) = c(w1,w2)/Σ_w c(w1,w). The
    * n-gram-count primitive behind repetition filters, boilerplate
    * detection and classic LM corpus statistics.
    *
    * Scale shape: one narrow pair expansion (element_at is O(1) per
    * element), one hash aggregate on the pair, one window keyed by w1
    * for the denominator — two shuffles total, both on token keys. */
  def bigramLM(spark: SparkSession, sfDir: String, topN: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = tokens(col("text"))
    // adjacent pairs as arrays_zip(tokens, tokens<<1) — native
    // expressions end to end (a transform(sequence, element_at) lambda
    // evaluates interpreted per pair); size >= 2 guard because slice
    // with length 0 errors
    val pairs = when(size(tk) >= 2,
      arrays_zip(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1)))
      .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))
    Tables(spark, sfDir, "documents")
      .select(explode(pairs).as("b"))
      .groupBy(col("b.0").as("w1"), col("b.1").as("w2"))
      .agg(count(lit(1)).as("c"))
      .withColumn("c1", sum("c").over(Window.partitionBy("w1")))
      .select(col("w1"), col("w2"), col("c"),
        round(col("c") * lit(1.0) / col("c1"), 6).as("p"))
      .orderBy(desc("c"), asc("w1"), asc("w2"))
      .limit(topN)
  }

  /** [[collocations]] min bigram count / top-k — shared with the
    * oracle builder so query and oracle cannot drift. */
  val COLL_MIN = 5
  val COLL_TOPN = 30

  /** PMI-ranked collocations (phrase mining): bigrams whose observed
    * count beats independence, ranked by the exact PMI ratio argument
    * lift = c(w1,w2)·T / (c(w1)·c(w2)) in integer ppm — ln-free (the
    * monotone transform preserves the ranking; ln itself is not
    * bit-portable, FIXTURES.md §C). Two-stage integer floor, an
    * always-bounded chain: c_xy ≤ c_x pins
    * c_xy · ((T·1e6) div c_x) ≤ T·1e6 < 2^63 through sf1000.
    *
    * Scale shape: one pair aggregate and one unigram aggregate (both
    * map-side combinable, token-keyed), the min-count filter prunes the
    * bigram relation BEFORE the two vocabulary joins, and the totals
    * row is a declared 1-row cross join. The phrase-mining front end of
    * a tokenizer-vocabulary or stopword pipeline. */
  def collocations(spark: SparkSession, sfDir: String,
      minCount: Int = COLL_MIN, topN: Int = COLL_TOPN): DataFrame = {
    val tk = tokens(col("text"))
    val pairs = when(size(tk) >= 2,
      arrays_zip(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1)))
      .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))
    val docs = Tables(spark, sfDir, "documents")
    val big = docs.select(explode(pairs).as("b"))
      .groupBy(col("b.0").as("w1"), col("b.1").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val uni = docs.select(explode(tk).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum("c").as("t_tok"))
    big.join(uni.toDF("w1", "c1"), "w1")
      .join(uni.toDF("w2", "c2"), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("lift_ppm", expr("(c_xy * ((t_tok * 1000000) div c1)) div c2"))
      .select(col("w1"), col("w2"), col("c_xy"), col("c1"), col("c2"),
        col("lift_ppm"))
      .orderBy(desc("lift_ppm"), asc("w1"), asc("w2"))
      .limit(topN)
  }

  /** DuckDB twin of [[collocations]] — identical two-stage `//` chain. */
  def collocationsOracle(minCount: Int = COLL_MIN, topN: Int = COLL_TOPN): String =
    s"""WITH ws AS (SELECT string_split(text, ' ') AS t FROM documents),
       |bg AS (SELECT t[pos] AS w1, t[pos + 1] AS w2
       |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS pos
       |             FROM ws WHERE len(t) >= 2)),
       |big AS (SELECT w1, w2, count(*) AS c_xy FROM bg
       |        GROUP BY 1, 2 HAVING count(*) >= $minCount),
       |uni AS (SELECT unnest(t) AS w FROM ws),
       |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t_tok FROM uni)
       |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       |       CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2,
       |       CAST((c_xy * ((t_tok * 1000000) // u1.c)) // u2.c AS BIGINT) AS lift_ppm
       |FROM big JOIN uc u1 ON w1 = u1.w JOIN uc u2 ON w2 = u2.w CROSS JOIN tot
       |ORDER BY lift_ppm DESC, w1, w2 LIMIT $topN""".stripMargin

  /** Per-document LM scoring against the corpus bigram model — the
    * CCNet-style quality-filter signal: documents whose bigrams are
    * improbable under the corpus LM are boilerplate/garbage candidates.
    * For every doc: number of bigrams, mean and min conditional
    * probability P(w2|w1) = c(w1,w2)/c(w1,·) over corpus counts. The
    * corpus includes the doc, so P > 0 always — no smoothing term to
    * diverge on. (Probabilities, not log-probs: `ln` is not guaranteed
    * correctly-rounded across libms, while sums of divisions are the
    * proven oracle-parity pattern.)
    *
    * Scale shape: all four shuffles key on tokens or doc_id (pair
    * counts, the w1 window, the pair join back, the per-doc aggregate);
    * document bodies never shuffle — only (doc_id, w1, w2) rows. */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = tokens(col("text"))
    val pairs = when(size(tk) >= 2,
      arrays_zip(slice(tk, lit(1), size(tk) - 1), slice(tk, lit(2), size(tk) - 1)))
      .otherwise(array().cast("array<struct<`0`:string,`1`:string>>"))
    val db = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(pairs).as("b"))
      .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("w2"))
    val counts = db.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .withColumn("c1", sum("c").over(Window.partitionBy("w1")))
    val p = col("c") * lit(1.0) / col("c1")
    db.join(counts, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(p), 6).as("mean_p"),
        round(min(p), 6).as("min_p"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[lmScore]]. */
  def lmScoreOracle: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |i AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
      |      FROM t WHERE len(tk) >= 2),
      |b AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2 FROM i),
      |c AS (SELECT w1, w2, count(*) AS c FROM b GROUP BY 1, 2),
      |tot AS (SELECT w1, sum(c) AS c1 FROM c GROUP BY 1),
      |p AS (SELECT b.doc_id, c.c * 1.0 / tot.c1 AS p
      |      FROM b JOIN c USING (w1, w2) JOIN tot USING (w1))
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |       round(avg(p), 6) AS mean_p, round(min(p), 6) AS min_p
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB twin of [[bigramLM]]. */
  def bigramLMOracle: String =
    """WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
      |i AS (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
      |      FROM t WHERE len(tk) >= 2),
      |b AS (SELECT tk[i] AS w1, tk[i + 1] AS w2 FROM i),
      |c AS (SELECT w1, w2, count(*) AS c FROM b GROUP BY 1, 2),
      |tot AS (SELECT w1, sum(c) AS c1 FROM c GROUP BY 1)
      |SELECT c.w1, c.w2, c.c, round(c.c * 1.0 / tot.c1, 6) AS p
      |FROM c JOIN tot USING (w1)
      |ORDER BY c.c DESC, c.w1, c.w2 LIMIT 30""".stripMargin

  /** Count-min sketch point estimates, checked against truth. The sketch
    * is fully deterministic (md5-derived row hashes), so unlike HLL it is
    * oracle-reproducible: DEPTH×WIDTH counters build in one aggregate
    * pass (fixed memory at any corpus size, mergeable across partitions
    * — the reason to sketch at 100 TB); the estimate for a term is the
    * min across rows of its bucket counts, always ≥ the true count.
    * Output: top-20 vocabulary terms with true vs estimated frequency. */
  val CMS_DEPTH = 3
  val CMS_WIDTH = 1024
  def cmsEstimates(spark: SparkSession, sfDir: String, topN: Int = 20): DataFrame = {
    import graft.functions.HashOps
    // aggregate to per-word counts FIRST: the md5 bucket hashing then
    // touches each distinct word once (vocabulary-sized), not every
    // token occurrence × DEPTH — counts are identical because the
    // sketch increments commute. Persisted: buckets/top both branch
    // from it.
    val wcf = Tables(spark, sfDir, "documents")
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def buckets(df: DataFrame): DataFrame =
      df.select(df.columns.toIndexedSeq.map(col) :+
        posexplode(array((0 until CMS_DEPTH).map(j =>
          pmod(HashOps.wordHashN(concat(lit(s"$j:"), col("w")), 15),
            lit(CMS_WIDTH.toLong))): _*)).as(Seq("j", "bucket")): _*)
    val sketch = buckets(wcf).groupBy("j", "bucket").agg(sum("cf").as("c"))
    val top = wcf.select(col("w"), col("cf").as("true_cf"))
      .orderBy(desc("true_cf"), asc("w")).limit(topN)
    buckets(top).join(sketch, Seq("j", "bucket"))
      .groupBy("w", "true_cf").agg(min("c").as("est_cf"))
      .orderBy(desc("true_cf"), asc("w"))
  }

  /** Deterministic hash sampling: keep documents whose md5-derived
    * 60-bit key falls in the lowest `pct` percent of the hash space —
    * reproducible across engines and runs, no RNG state. The standard
    * way to cut a stable sample of a 100 TB corpus. */
  def hashSample(spark: SparkSession, sfDir: String, pct: Int = 10): DataFrame =
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.HashOps.wordHashN(col("text"), 15).as("hk"))
      .filter(pmod(col("hk"), lit(100L)) < pct)
      .select(col("doc_id"))
      .orderBy("doc_id")

  // ----------------------------------------------------------- fingerprint

  val FP_MOD = 1000000007L

  /** Position-weighted polynomial document fingerprint:
    * sum_i ((h(w_i) mod P) * ((i*31+7) mod P)) mod P, i 1-based —
    * order-sensitive (a permuted document fingerprints differently),
    * overflow-free in int64, and exactly reproducible in SQL. Narrow:
    * transform-with-index + aggregate, no shuffle. */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val terms = transform(tokens(col("text")), (w, i) =>
      pmod(pmod(graft.functions.HashOps.wordHash(w), lit(FP_MOD))
        * pmod((i + 1) * 31 + 7, lit(FP_MOD)), lit(FP_MOD)))
    Tables(spark, sfDir, "documents").select(
      col("doc_id"),
      pmod(aggregate(terms, lit(0L), (acc, x) => acc + x), lit(FP_MOD)).as("fingerprint"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------- hashed linear classifier

  /** Feature-hash bucket count for [[classifierScores]] (2^18, the
    * fastText default order of magnitude). */
  val CLF_BUCKETS = 1 << 18

  /** fastText-style hashed linear classifier INFERENCE at corpus scale —
    * the data flow of applying a trained quality/toxicity filter to
    * 100 TB (RefinedWeb/CCNet run exactly this shape): per document,
    * hash unigram + bigram features into [[CLF_BUCKETS]] buckets, look
    * up each bucket's weight, fold the sum, threshold into a label.
    *
    * The weight table is a deterministic stand-in: w(b) = md5-derived
    * integer in [-128, 127] computed FROM the bucket id, so both engines
    * derive the identical table without materializing it. A production
    * deployment broadcasts the real trained table (≤ a few MB — fastText
    * quantizes to less) and replaces the w(b) expression with a
    * broadcast-map lookup; hashing, fold and threshold are unchanged —
    * the part that must scale IS what's tested here.
    *
    * Scale shape: one narrow codegen'd pass per document (split →
    * zip_with bigrams → transform to weights → aggregate fold), no
    * shuffle, no join, no UDF; integer arithmetic end-to-end so the
    * DuckDB oracle hash-matches. */
  def classifierScores(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.HashOps.wordHashN
    val toks = tokens(col("text"))
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit("_"), b))
    val feats = concat(toks, bigrams)
    def weight(f: Column): Column = {
      val bkt = pmod(wordHashN(concat(lit("clff_"), f), 15), lit(CLF_BUCKETS.toLong))
      pmod(wordHashN(concat(lit("clfw_"), bkt.cast("string")), 15), lit(256L)) - 128L
    }
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), feats.as("fs"))
      .select(col("doc_id"), col("lang"),
        size(col("fs")).cast("long").as("n_feat"),
        aggregate(transform(col("fs"), weight(_)), lit(0L), (acc, x) => acc + x).as("score"))
      .select(col("doc_id"), col("lang"), col("n_feat"), col("score"),
        when(col("score") >= 0, 1L).otherwise(0L).as("label"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[classifierScores]] — rebuilds the identical
    * bucket→weight derivation from the same md5 arithmetic. */
  def classifierOracle: String = {
    val h = graft.functions.HashOps.wordHashSqlN(15)
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
       |u AS (SELECT doc_id, unnest(toks) AS f FROM t),
       |b AS (SELECT doc_id, toks[i] || '_' || toks[i + 1] AS f
       |      FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
       |            FROM t)),
       |f AS (SELECT * FROM u UNION ALL SELECT * FROM b),
       |bk AS (SELECT doc_id, ($h) % $CLF_BUCKETS AS bkt
       |       FROM (SELECT doc_id, md5('clff_' || f) AS m FROM f)),
       |w AS (SELECT doc_id, (($h) % 256) - 128 AS w
       |      FROM (SELECT doc_id, md5('clfw_' || bkt) AS m FROM bk)),
       |s AS (SELECT doc_id, count(*) AS n_feat, sum(w) AS w_sum FROM w GROUP BY doc_id)
       |SELECT t.doc_id, t.lang, CAST(coalesce(s.n_feat, 0) AS BIGINT) AS n_feat,
       |       CAST(coalesce(s.w_sum, 0) AS BIGINT) AS score,
       |       CAST(CASE WHEN coalesce(s.w_sum, 0) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS label
       |FROM t LEFT JOIN s ON t.doc_id = s.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** Minimum docs per [[heapsLaw]] growth bucket (small corpora). */
  val HeapsBucketDocs = 50L

  /** Maximum number of [[heapsLaw]] growth buckets: the bucket width is
    * DERIVED as `greatest(HeapsBucketDocs, (max_doc_id + 1) div
    * HeapsMaxBuckets)` so the curve resolution grows with the corpus
    * and the buckets-sized tail relation (and its single unpartitioned
    * cumulative window) stays bounded at ≤ ~200 rows at ANY scale —
    * a fixed 50-doc width made the window corpus/50-sized, i.e.
    * unbounded at 100 TB (VERDICT r11). Below 10k docs the derived
    * width is exactly the old constant, so gate-sf results are
    * unchanged. */
  val HeapsMaxBuckets = 200L

  /** Heaps-law vocabulary growth curve: ingest the corpus in doc_id
    * order, bucketed a derived-width slice of docs at a time (see
    * [[HeapsMaxBuckets]]), and report per bucket the cumulative token
    * count and cumulative DISTINCT-word vocabulary — the (N, V) pairs
    * whose log-log slope is the Heaps exponent, the standard
    * corpus-growth diagnostic a training-data pipeline tracks while
    * crawling. Exact integers throughout: a word's contribution to
    * vocabulary growth lands in the bucket of its FIRST occurrence
    * (min bucket per word — associative, so the computation is one
    * word-keyed aggregate, not a quadratic prefix-distinct).
    *
    * Scale shape: one 1-row width aggregate (broadcast), then ONE
    * corpus scan explodes words (narrow), one map-side-combinable word
    * aggregate (the vocabulary shuffle), one bucket aggregate, then
    * windows over the buckets-sized relation — now bounded at
    * [[HeapsMaxBuckets]] rows by the derived width at every sf. */
  def heapsLaw(spark: SparkSession, sfDir: String,
      maxBuckets: Long = HeapsMaxBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, sfDir, "documents")
    val bw = docs.agg(greatest(lit(HeapsBucketDocs),
      expr(s"(max(doc_id) + 1) div $maxBuckets")).as("bw"))
    val words = docs.crossJoin(broadcast(bw))
      .select(expr("doc_id div bw").as("bucket"),
        explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val tokPerB = words.groupBy("bucket").agg(count(lit(1)).as("n_tokens"))
    val newPerB = words.groupBy("w").agg(min("bucket").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_new_words"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokPerB.join(newPerB, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_new_words"))
      .withColumn("n_tokens_cum", sum("n_tokens").over(w))
      .withColumn("vocab_size", sum("n_new_words").over(w))
      .select(col("bucket"), col("n_tokens_cum"), col("n_new_words"),
        col("vocab_size"))
      .orderBy("bucket")
  }

  /** DuckDB twin of [[heapsLaw]] — identical derived bucket width,
    * first-bucket attribution and cumulative windows. */
  def heapsOracle(maxBuckets: Long = HeapsMaxBuckets): String =
    s"""WITH bw AS (SELECT greatest($HeapsBucketDocs,
       |                            (max(doc_id) + 1) // $maxBuckets) AS b
       |            FROM documents),
       |wd AS (SELECT doc_id // (SELECT b FROM bw) AS bucket,
       |                  unnest(string_split(text, ' ')) AS w
       |            FROM documents),
       |wf AS (SELECT bucket, w FROM wd WHERE w <> ''),
       |tok AS (SELECT bucket, count(*) AS n_tokens FROM wf GROUP BY bucket),
       |nw AS (SELECT bucket, count(*) AS n_new_words
       |       FROM (SELECT w, min(bucket) AS bucket FROM wf GROUP BY w)
       |       GROUP BY bucket)
       |SELECT t.bucket,
       |       CAST(sum(t.n_tokens) OVER cw AS BIGINT) AS n_tokens_cum,
       |       CAST(coalesce(nw.n_new_words, 0) AS BIGINT) AS n_new_words,
       |       CAST(sum(coalesce(nw.n_new_words, 0)) OVER cw AS BIGINT) AS vocab_size
       |FROM tok t LEFT JOIN nw ON t.bucket = nw.bucket
       |WINDOW cw AS (ORDER BY t.bucket ROWS UNBOUNDED PRECEDING)
       |ORDER BY t.bucket""".stripMargin
}
