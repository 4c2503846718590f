package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashOps
import graft.plans.MinHashSig
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

  /** (doc_id, hsh ARRAY<BIGINT>) — per-doc distinct shingles keyed by
    * their 60-bit md5-derived hash: ONE md5 per (doc, shingle) feeds
    * every dedup operator, downstream joins shuffle 8-byte longs instead
    * of shingle strings, and the oracle derives the identical keys (so
    * even a hash collision — P ≈ n²/2⁶¹ — reproduces exactly on both
    * sides). */
  private[graft] def hashedShingles(spark: SparkSession, sfDir: String): DataFrame =
    // r16: materialized per corpus (the coOrderEdges device) — the md5
    // shingle kernel sweep feeds several dedup pipelines per pass
    // (ngram build, minhash build, jaccard_prefix) which each re-ran it
    graft.sources.Scratch.materialize(spark,
        s"dedup_shingles:${graft.sources.Scratch.corpusKey(sfDir)}") {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      // r17: widened scan (guide §2.5) — the md5 sweep is CPU-bound
      // and the fixture layout provides fewer scan tasks than cores
      Tables.documentsWide(spark, sfDir)
        .select(col("doc_id"),
          column(graft.plans.HashedShingles(
            expression(split(col("text"), " ")), 3)).as("hsh"))
    }

  /** (doc_id, shh) — exploded form of [[hashedShingles]]. */
  private def shingleRows(spark: SparkSession, sfDir: String): DataFrame =
    hashedShingles(spark, sfDir)
      .select(col("doc_id"), explode(col("hsh")).as("shh"))

  /** Char window length of [[substringDupStats]]. */
  val SubstrLen = 40

  /** Substring-level duplication stats (the Lee et al. 2021 exact
    * substring-dedup signal): for every document, how many of its
    * `SubstrLen`-char sliding windows also occur in ANOTHER document,
    * plus the shared fraction. A doc with a high shared_frac is
    * boilerplate/templated and a removal candidate even when no
    * whole-doc near-dup fires.
    *
    * Scale shape: windows travel as 60-bit md5 hashes from the first
    * projection (the 40-char strings never cross a shuffle); the
    * window stream is persisted because both the distinct-df branch and
    * the per-doc count branch consume it; per-window doc-frequency is a
    * distinct + count (never count-distinct's expand). The window
    * count per doc is computed narrowly from length(text) — no second
    * pass. */
  def substringDupStats(spark: SparkSession, sfDir: String,
      len: Int = SubstrLen): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    // native one-pass window kernel (O(len), not O(len²) substr seeks)
    val wins = column(graft.plans.CharGrams(expression(col("text")), len))
    val w = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), explode(wins).as("w"))
      .select(col("doc_id"), HashOps.wordHashN(col("w"), 15).as("wh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shared = w.distinct()
      .groupBy("wh").agg(count(lit(1)).as("ddf"))
      .filter(col("ddf") >= 2).select("wh")
    val ns = w.join(shared, "wh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        greatest(length(col("text")) - (len - 1), lit(0)).cast("long").as("n_windows"))
      .join(ns, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)) * lit(1.0)
          / greatest(col("n_windows"), lit(1L)), 6).as("shared_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[substringDupStats]] — same md5-derived hashes. */
  def substringDupOracle: String = {
    val L = SubstrLen
    s"""WITH w0 AS (SELECT doc_id,
       |              unnest(list_transform(generate_series(1, length(text) - ${L - 1}),
       |                                    i -> substring(text, i, $L))) AS w
       |            FROM documents WHERE length(text) >= $L),
       |w AS (SELECT doc_id, ${HashOps.wordHashSqlN(15)} AS wh
       |      FROM (SELECT doc_id, md5(w) AS m FROM w0)),
       |sh AS (SELECT wh FROM (SELECT DISTINCT doc_id, wh FROM w)
       |       GROUP BY wh HAVING count(*) >= 2),
       |ns AS (SELECT doc_id, count(*) AS n_shared FROM w JOIN sh USING (wh)
       |       GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(greatest(length(d.text) - ${L - 1}, 0) AS BIGINT) AS n_windows,
       |       CAST(coalesce(ns.n_shared, 0) AS BIGINT) AS n_shared,
       |       round(coalesce(ns.n_shared, 0) * 1.0
       |             / greatest(greatest(length(d.text) - ${L - 1}, 0), 1), 6) AS shared_frac
       |FROM documents d LEFT JOIN ns USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- exact

  /** Exact dedup: one survivor (min doc_id) per identical text; shuffle
    * key is md5(text). Output: (doc_id, n_dups). */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
      .select(col("doc_id"), col("n_dups"))
      .orderBy("doc_id")

  // ------------------------------------------------- passage-block dedup

  /** Word-block width of [[passageDedup]] — the corpus carries no line
    * breaks (documents are space-joined words), so fixed 20-word blocks
    * stand in for the lines a line-level dedup would key on. */
  val PASSAGE_WORDS = 20

  /** Passage-level exact dedup (the CCNet line-dedup step, Wenzek et
    * al. LREC 2020 §3.1, as RefinedWeb applies it): each document
    * splits into fixed [[PASSAGE_WORDS]]-word blocks, a block survives
    * iff it is the corpus-FIRST occurrence of its md5 (order: doc_id,
    * block index), and the per-doc summary plus the md5 of the
    * reassembled kept text pins every keep/drop decision at every
    * position.
    *
    * Scale shape: blocks derive from one narrow projection (no
    * shuffle); the first-occurrence decision is ONE window
    * hash-partitioned on md5(block) — the same single-shuffle,
    * 32-byte-key posture as [[exact]], carrying corpus-sized block
    * rows, never pairs. Per-group sorts are occurrence lists of one
    * hash — tiny unless the corpus is one giant duplicate, in which
    * case dedup IS the workload. */
  def passageDedup(spark: SparkSession, sfDir: String,
      blockWords: Int = PASSAGE_WORDS): DataFrame = {
    val firstWin = Window.partitionBy(md5(col("blk").cast("binary")))
      .orderBy("doc_id", "blk_idx")
    passageSummaryOf(
      passageBlocksOf(Tables(spark, sfDir, "documents"), blockWords)
        .withColumn("keep", row_number().over(firstWin) === 1))
  }

  /** `(doc_id, blk_idx, blk)` — the fixed-width word blocks of a
    * `(doc_id, text, …)` relation. Blocking depends only on the row, so
    * a document blocks identically in a batch load or a micro-batched
    * stream (the [[cdcChunkRowsFrom]] locality argument) — shared with
    * [[graft.streaming.PassageLedgerStream]]. */
  private[graft] def passageBlocksOf(docs: DataFrame, blockWords: Int): DataFrame = {
    val ws = split(col("text"), " ")
    docs.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), floor((size(ws) - 1) / lit(blockWords)).cast("int")),
        i => array_join(slice(ws, i * blockWords + 1, lit(blockWords)), " ")))
        .as(Seq("blk_idx", "blk")))
  }

  /** Per-doc survival summary over keep-flagged block rows
    * `(doc_id, blk_idx, blk, keep)`. */
  private[graft] def passageSummaryOf(flagged: DataFrame): DataFrame =
    flagged
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), length(col("blk")).cast("long")).otherwise(0L))
          .as("n_chars_kept"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("blk_idx"), col("blk"))))),
          s => s.getField("blk")), " ").cast("binary")).as("kept_hash"))
      .orderBy("doc_id")

  /** DuckDB twin of [[passageDedup]] — identical blocking, identical
    * first-occurrence order. `coalesce('')` matches Spark's empty
    * array_join when a doc keeps no block. */
  def passageDedupOracle: String = {
    val b = PASSAGE_WORDS
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |blk AS (SELECT doc_id, (pos - 1) // $b AS blk_idx,
       |               string_agg(w, ' ' ORDER BY pos) AS b
       |        FROM (SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS w
       |              FROM ws)
       |        GROUP BY doc_id, (pos - 1) // $b),
       |k AS (SELECT doc_id, blk_idx, b,
       |             row_number() OVER (PARTITION BY md5(b)
       |                                ORDER BY doc_id, blk_idx) = 1 AS keep
       |      FROM blk)
       |SELECT doc_id, count(*) AS n_blocks,
       |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN keep THEN length(b) ELSE 0 END) AS BIGINT) AS n_chars_kept,
       |       md5(coalesce(string_agg(CASE WHEN keep THEN b END, ' ' ORDER BY blk_idx), '')) AS kept_hash
       |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------- exact n-gram Jaccard

  /** Exact word-3-gram Jaccard over discriminative shingles (global
    * df ≤ maxDf): candidates share ≥1 such shingle; Jaccard is computed
    * over each document's restricted shingle set. Integer counts → the
    * score is exactly reproducible. Output pairs with j ≥ threshold. */
  def ngramJaccard(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5, maxDf: Int = 50): DataFrame = {
    // posting-list pair generation: ONE groupBy(shh) builds each rare
    // shingle's (sorted, ≤maxDf) doc list, and ordered pairs expand as a
    // narrow per-group loop — replaces a 2-sided self-join shuffle of all
    // shingle rows, and the df cap bounds each group's fan-out at
    // maxDf·(maxDf−1)/2. Same pair multiset as the join formulation.
    // The shingle table is read ONCE: per-doc restricted set sizes come
    // from re-exploding the compact posting lists (shingles are distinct
    // per doc, so explode(ds) IS the kept (shh, doc) row set) instead of
    // joining the full shingle table back against the kept keys.
    // r16: the verified pair relation (tiny — near-dup-density-sized)
    // is materialized per parameterization: `dedup_recall` re-derived
    // the identical relation per pass; the ORDER BY re-applies after
    // the parquet read (writes don't preserve order).
    graft.sources.Scratch.materialize(spark,
        s"dedup_ngram:$threshold:$maxDf:${graft.sources.Scratch.corpusKey(sfDir)}") {
      ngramJaccardFrom(shingleRows(spark, sfDir), threshold, maxDf)
    }.orderBy("doc_a", "doc_b")
  }

  /** [[ngramJaccard]] over a pre-built (doc_id, shh) shingle-row table —
    * lets an evaluation query share one hashed-shingle sweep across
    * several dedup pipelines. */
  private[graft] def ngramJaccardFrom(shRows: DataFrame,
      threshold: Double = 0.5, maxDf: Int = 50): DataFrame = {
    val lists = shRows.groupBy("shh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= maxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sz = lists.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairExpr = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
        struct(x.as("doc_a"), y.as("doc_b")))))
    val pairs = lists
      .select(explode(pairExpr).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    val j = (col("c") * lit(1.0)) / (col("na") + col("nb") - col("c"))
    pairs
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(j >= threshold)
      .select(col("doc_a"), col("doc_b"), round(j, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------- prefix-filter exact Jaccard

  /** Jaccard threshold of [[jaccardPrefix]] as an exact rational
    * (3/5 = 0.6) — the comparison never leaves integer space. */
  val JacNum = 3
  val JacDen = 5

  /** EXACT Jaccard similarity join over the FULL per-doc shingle sets
    * via prefix filtering (the PPJoin family, Xiao et al. WWW 2008 /
    * Chaudhuri et al. ICDE 2006): no df cap, no sampling — every pair
    * with J ≥ [[JacNum]]/[[JacDen]] is returned, yet no O(N²) work
    * happens. Complements [[ngramJaccard]], whose rare-shingle
    * restriction + posting-list cap trade exactness for bounded
    * fan-out: here exactness is recovered from the prefix-filter
    * THEOREM instead — order each doc's shingles by ascending global
    * df (tie: shh), keep only the first n − ⌈t·n⌉ + 1 as candidate
    * keys; two sets with J ≥ t MUST share a prefix key (if they
    * disagreed on all prefix keys, the overlap is bounded below t·n).
    * A size-compatibility prune (t·max ≤ min) drops cross-length pairs
    * before they expand.
    *
    * Scale shape: corpus-sized relations cross exactly two key spaces —
    * the shingle hash (df count + prefix posting lists) and the doc id
    * (prefix selection window, verification joins); candidate pairs
    * (116 at sf0.01, vs 11,533 share-any-shingle pairs — a 99% prune,
    * measured) join back to the per-doc shingle ARRAYS for one
    * `array_intersect` verification, so the full sets never re-shuffle
    * per pair. Prefix posting lists stay short by construction: a
    * shingle enters a doc's prefix only while it is among that doc's
    * ~(1−t)·n RAREST, so hot shingles drop out of every prefix as their
    * df grows — the self-limiting property that replaces [[ngramJaccard]]'s
    * hard cap. Output: (doc_a, doc_b, jaccard_ppm) — the score as exact
    * integer ppm (floor), the FIXTURES.md rounding-tie device. */
  def jaccardPrefix(spark: SparkSession, sfDir: String): DataFrame = {
    val base = hashedShingles(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sh = base.select(col("doc_id"), explode(col("hsh")).as("shh"))
    val dfRel = sh.groupBy("shh").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
    val pref = sh.join(dfRel, "shh")
      .select(col("doc_id"), col("shh"),
        row_number().over(w.orderBy("df", "shh")).as("rn"),
        count(lit(1)).over(w).as("n"))
      .filter(col("rn") <= col("n") - expr(s"($JacNum * n + $JacDen - 1) div $JacDen") + 1)
    // posting-list pair expansion with the size-compat prune inline —
    // same narrow per-group loop as [[ngramJaccardFrom]], no self-join
    val pairExpr = flatten(transform(col("ds"), (x, i) =>
      filter(
        transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
          struct(x.getField("doc_id").as("doc_a"), y.getField("doc_id").as("doc_b"),
            x.getField("n").as("na"), y.getField("n").as("nb"))),
        p => lit(JacNum) * greatest(p.getField("na"), p.getField("nb")) <=
          lit(JacDen) * least(p.getField("na"), p.getField("nb")))))
    val cand = pref.groupBy("shh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .select(explode(pairExpr).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.na"), col("p.nb"))
      .distinct()
    val c = size(array_intersect(col("ha"), col("hb")))
    val u = col("na") + col("nb") - c
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("hsh").as("ha")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("hsh").as("hb")), "doc_b")
      .filter(c * lit(JacDen) >= u * lit(JacNum))
      .select(col("doc_a"), col("doc_b"), c.cast("long").as("c"), u.cast("long").as("u"))
      .select(col("doc_a"), col("doc_b"),
        expr("c * 1000000 div u").as("jaccard_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------------- MinHash

  val MINHASH_PERMS = 16
  val MINHASH_BANDS = 8 // 2 rows per band
  val MINHASH_P = 1000000007L
  val MINHASH_B = 2654435761L // Knuth multiplicative constant for offsets

  /** MinHash + LSH near-dup: 16 deterministic permutations over the
    * 60-bit shingle hash — h_j = ((2j+1)·(shh mod P) + j·B mod P) mod P,
    * one md5 per shingle total (a md5-per-permutation formulation costs
    * 16× the hashing — measured) — banded 8×2; docs sharing a band key
    * become candidates; candidates are verified with exact shingle
    * Jaccard. Fully deterministic → oracle-reproducible including
    * recall misses. */
  def minhashLSH(spark: SparkSession, sfDir: String,
      threshold: Double = 0.5): DataFrame =
    // ONE md5 sweep: the hashed-shingle base feeds both the signature
    // kernel and the verification rows. r16: the verified pair relation
    // is materialized per parameterization — FIVE queries walk it per
    // pass (dedup_minhash, dedup_recall, dedup_edit via candidate
    // pairs, dedup_components, dedup_canonical), each previously
    // re-running the whole signature+band+verify pipeline; the ORDER BY
    // re-applies after the parquet read.
    graft.sources.Scratch.materialize(spark,
        s"dedup_minhash:$threshold:${graft.sources.Scratch.corpusKey(sfDir)}") {
      minhashLSHFrom(hashedShingles(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK), threshold)
    }.orderBy("doc_a", "doc_b")

  /** [[minhashLSH]] over a pre-built (doc_id, hsh) hashed-shingle base
    * (caller owns its persistence). */
  private[graft] def minhashLSHFrom(base: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val sh = base.select(col("doc_id"), explode(col("hsh")).as("shh"))
    // signature = narrow one-pass kernel over the per-doc hash array
    // (no explode, no shuffle); NULL = too short for 3-grams → dropped
    val sig = base
      .select(col("doc_id"), column(MinHashSig(
        expression(col("hsh")), MINHASH_PERMS, MINHASH_P, MINHASH_B)).as("sig"))
      .filter(col("sig").isNotNull)
    val bk = sig.select(col("doc_id"),
      posexplode(array((0 until MINHASH_BANDS).map(b =>
        element_at(col("sig"), 2 * b + 1) * MINHASH_P +
          element_at(col("sig"), 2 * b + 2)): _*)).as(Seq("band", "key")))
    val bkP = bk.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bkP.as("a").join(bkP.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(sh, cand, threshold)
  }

  /** Duplicate-cluster resolution: connected components over the near-dup
    * pair graph ([[minhashLSH]] edges), labeling every involved document
    * with the minimum doc_id of its component — the canonical
    * representative each non-canonical doc collapses into.
    *
    * Iterative min-label propagation (the scalable formulation: each
    * round is one join + one aggregate shuffled on ids; rounds =
    * component diameter, tiny for dedup clusters). The driver sees only
    * a scalar change-count per round — nothing O(N). */
  /** Edit-distance verification of the LSH candidates: exact Levenshtein
    * over the candidate pairs' texts — the integer-exact fuzzy-match
    * refinement (O(len²) per pair, so ONLY ever after candidate pruning;
    * running it all-pairs would be quadratic in the corpus). */
  def editDistancePairs(spark: SparkSession, sfDir: String,
      maxDist: Int = 50): DataFrame = {
    val pairs = minhashLSH(spark, sfDir).select("doc_a", "doc_b")
    val docs = Tables(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
      .orderBy("doc_a", "doc_b")
  }

  /** Canonical-document selection per duplicate cluster — the step that
    * turns dedup DETECTION into dedup ACTION: each near-dup component
    * keeps its highest-quality member (the heuristic quality score of
    * [[TextAnalysis.quality]], lowest doc_id on score ties) and drops
    * the rest — one row per component with the kept doc, its score, and
    * the member/dropped counts. This is the decision record a training
    * pipeline writes before deleting 100 TB of near-duplicates.
    *
    * Plan shape: [[components]] (LSH-bounded pair graph) joins the
    * narrow per-doc quality projection on doc_id; the per-component
    * argmax is a window over component ids — components are small by
    * LSH construction (bucket caps bound the pair fan-out), so the
    * window state per key is tiny at any corpus size. */
  def canonical(spark: SparkSession, sfDir: String): DataFrame = {
    val comp = components(spark, sfDir)
    val q = Tables(spark, sfDir, "documents").select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("score"))
    val w = Window.partitionBy("component").orderBy(desc("score"), asc("doc_id"))
    comp.join(q, "doc_id")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("component"))
      .agg(
        max(when(col("rn") === 1, col("doc_id"))).as("canonical_doc"),
        max(when(col("rn") === 1, col("score"))).as("canonical_score"),
        count(lit(1)).as("n_members"),
        (count(lit(1)) - 1L).as("n_dropped"))
      .orderBy("component")
  }

  /** Edge-count threshold below which [[components]] solves the graph
    * driver-side (union-find over a collected edge list — the same
    * small-side economics as a broadcast join). Above it, the
    * distributed min-label propagation runs. 1M edges ≈ 16 MB. */
  val COMPONENTS_LOCAL_EDGES = 1000000L

  def components(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // persist the pair list itself: the symmetrizing union below has two
    // branches, and an unpersisted lineage would run the whole LSH
    // pipeline once per branch (lambda-HOF plans don't CSE across
    // branches — PERF.md rule 6)
    val pairs = minhashLSH(spark, sfDir).select("doc_a", "doc_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (pairs.count() <= COMPONENTS_LOCAL_EDGES) componentsLocal(spark, pairs)
    else componentsDistributed(spark, pairs)
  }

  /** Distributed min-label propagation over (doc_a, doc_b) pairs. */
  def componentsDistributed(spark: SparkSession, pairs: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.unionByName(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("component", col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cached = labels // the persisted frame currently backing `labels`
    var changed = 1L
    while (changed > 0) {
      val viaNeighbor = edges
        .join(labels.select(col("doc_id").as("doc_b"), col("component")), "doc_b")
        .groupBy(col("doc_a").as("doc_id")).agg(min("component").as("nbr"))
      // change detection rides in the same pass — one job per round
      val next = labels.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("component"), coalesce(col("nbr"), col("component"))).as("component"),
          (coalesce(col("nbr"), col("component")) < col("component")).as("chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("chg")).count()
      cached.unpersist()
      cached = next
      labels = next.select(col("doc_id"), col("component"))
    }
    edges.unpersist()
    labels.orderBy("doc_id")
  }

  /** Driver union-find over a small collected edge list; min doc_id per
    * component (path-compressed, union-by-min keeps the canonical id). */
  private def componentsLocal(spark: SparkSession, pairs: DataFrame): DataFrame = {
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // union by min: the smaller id stays the root
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val rows = parent.keys.toSeq.sorted.map(id => (id, find(id)))
    spark.createDataFrame(rows).toDF("doc_id", "component")
      .orderBy("doc_id")
  }

  /** Exact-Jaccard verification of candidate pairs against the full
    * distinct shingle sets. */
  private def verifyJaccard(sh: DataFrame, cand: DataFrame, threshold: Double): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val ov = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shh")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shh").as("shh2")), "doc_b")
      .filter(col("shh") === col("shh2"))
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

  val SIMHASH_BITS = 60 // 15 md5 nibbles — positive in int64
  val SIMHASH_BANDS = 4 // 15 bits per band
  val SIMHASH_BAND_BITS: Int = SIMHASH_BITS / SIMHASH_BANDS
  val SIMHASH_BUCKET_CAP = 200

  /** 60-bit SimHash signature per document as a BIGINT (token
    * multiplicity counted): bit b = sign of Σ_tokens (±1 by bit b of the
    * 60-bit wordHash). Narrow per-row computation, no shuffle; the whole
    * signature is ONE expression tree — a single fold over the
    * token-hash array accumulating all 60 bit counters in an array, then
    * sign → power-of-two → sum. (A bit-per-fold formulation re-evaluates
    * the token hashing per bit: lambda HOFs are excluded from
    * subexpression elimination — 10× slower, measured.) */
  def simhashSignatures(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val sig = column(graft.plans.SimHash60(expression(split(col("text"), " "))))
    Tables(spark, sfDir, "documents").select(col("doc_id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs: 4×15-bit band LSH with a deterministic
    * bucket-size cap (stop-buckets — band keys shared by > cap docs —
    * are skipped: the standard LSH skew guard, mirrored in the oracle),
    * then exact Hamming via `bit_count(sa xor sb)`. */
  def simhashPairs(spark: SparkSession, sfDir: String, maxHamming: Int = 3): DataFrame = {
    // signatures are md5-heavy and the plan below branches 4+ ways
    // (band explode, bucket-size agg, both self-join sides) — persist the
    // tiny (doc_id, sig) relation so the fold runs ONCE over the corpus
    val sig = simhashSignatures(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bandedHammingPairs(sig, SIMHASH_BAND_BITS, SIMHASH_BANDS,
      SIMHASH_BUCKET_CAP, maxHamming)
  }

  /** Banded-LSH hamming pairs over any (doc_id, sig BIGINT) signature
    * relation: band keys from bit slices, capped buckets (a hot bucket
    * can never go quadratic), candidate equi-join, exact
    * `bit_count(xor)` verification. Shared by [[simhashPairs]] and
    * [[Multimodal.phashPairs]]. */
  private[graft] def bandedHammingPairs(sig: DataFrame, bandBits: Int,
      nBands: Int, cap: Int, maxHamming: Int): DataFrame = {
    val bands = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(col("sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))): _*)).as(Seq("band", "key")))
    val ok = bands.groupBy("band", "key").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= cap).select("band", "key")
    val bk = bands.join(ok, Seq("band", "key"))
    val cand = bk.as("a").join(bk.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.sig").as("sa"),
        col("b.doc_id").as("doc_b"), col("b.sig").as("sb"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------ MOSS match pairs

  /** MOSS match pairs — the consumer of [[TextAnalysis.winnow]]'s
    * fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 §5: two
    * documents match when their fingerprint sets intersect; the shared
    * count ranks match strength). Fingerprints dedup to (doc_id, fp)
    * first (one fingerprint selected at several positions counts once),
    * then hot fingerprints — shared by more than `cap` docs, i.e.
    * corpus boilerplate — are dropped before any pairing (the
    * [[ngramJaccard]] stop-bucket guard: no fingerprint can go
    * quadratic). Pairs expand from per-fingerprint posting lists, the
    * same narrow per-group loop as [[ngramJaccardFrom]] — never a
    * two-sided self-join shuffle — so candidate fan-out is bounded by
    * cap·(cap−1)/2 per fingerprint at any corpus size. The winnowing
    * guarantee transfers: any shared substring of length ≥ w+k−1 (= 11
    * at the defaults) produces ≥ 1 shared fingerprint, so
    * `minShared = 1` finds every such overlap among non-boilerplate
    * fingerprints; the default 2 keeps only corroborated matches (the
    * rank-by-overlap shape MOSS reports). */
  def winnowPairs(spark: SparkSession, sfDir: String,
      cap: Int = 50, minShared: Long = 2): DataFrame = {
    // fingerprint identity only: strip the position nibble from the
    // MATERIALIZED distinct selections (the shared winnow index —
    // [[TextAnalysis.winnowSelections]]; one corpus-sized gram+window
    // pass amortized across this and `text_winnow`) and dedup the
    // residual multi-position fingerprints inside collect_set
    val fps = TextAnalysis.winnowSelections(spark, sfDir, 8, 4)
      .select(expr(s"sel div ${1L << 20}").as("fp"), col("doc_id"))
    val lists = fps.groupBy("fp")
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) <= cap)
    postingPairCounts(lists, minShared)
  }

  /** Expand per-fingerprint SORTED posting lists `ds` into doc pairs
    * and count shared fingerprints — the MOSS match-rank reduction,
    * shared verbatim by [[winnowPairs]] and the incremental ledger view
    * ([[graft.streaming.WinnowLedgerStream.currentPairs]]) so the batch
    * operator and its streaming twin cannot drift. */
  private[graft] def postingPairCounts(lists: DataFrame,
      minShared: Long): DataFrame = {
    val pairExpr = flatten(transform(col("ds"), (x, i) =>
      transform(slice(col("ds"), i + 2, size(col("ds"))), y =>
        struct(x.as("doc_a"), y.as("doc_b")))))
    lists.select(explode(pairExpr).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB twin of [[winnowPairs]] (defaults cap=50, minShared=2) —
    * replays the shared fingerprint CTEs, the df cap, and the pair
    * count. */
  def winnowPairsOracle: String =
    s"""WITH ${TextAnalysis.winnowOracleCtes},
       |fps AS (SELECT DISTINCT doc_id, fp FROM wfp),
       |keep AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 50),
       |kf AS (SELECT fps.doc_id, fps.fp FROM fps JOIN keep USING (fp))
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |FROM kf a JOIN kf b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------- content-defined chunking

  /** Gram width of the CDC boundary hash ([[cdcChunks]]). */
  val CdcK = 16

  /** CDC boundary divisor: a cut lands where the k-gram hash ≡ 0
    * (mod CdcD), so expected chunk length ≈ CdcD chars. */
  val CdcD = 64

  /** Minimum chunk length for [[chunkDupGroups]] — boundary-adjacent
    * slivers below this carry no dedup signal. */
  val CdcMinDupLen = 20L

  /** Content-defined chunking — the LBFS/FastCDC device (Muthitacharoen
    * et al., SOSP 2001; Xia et al., USENIX ATC 2016): cut every document
    * where the [[CdcK]]-char gram's md5-derived hash ≡ 0 (mod [[CdcD]]).
    * Cut points depend only on LOCAL content, so an edit displaces at
    * most the chunks it touches — unlike fixed-width blocks, where one
    * insertion shifts every later boundary — and chunk-hash equality
    * finds the shared spans between near-identical documents. Output:
    * one row per chunk `(doc_id, chunk_idx, start_pos, chunk_len,
    * chunk_hash)`, the unit a chunk-level dedup store keys on.
    *
    * The published algorithms roll a stateful hash byte-by-byte; the
    * hash here is stateless per k-gram (the same fixed-window
    * simplification [[TextAnalysis.winnow]] uses), which keeps the
    * boundary rule a pure per-position predicate BOTH engines can
    * evaluate identically — content-defined alignment is preserved, and
    * there is deliberately no min-size suppression, whose
    * previous-boundary recursion neither engine expresses as a window.
    *
    * Scale shape: one narrow gram pass (native [[graft.plans.CharGrams]]
    * kernel — gram strings are hashed in the same projection and never
    * cross a shuffle); boundary positions aggregate to ONE short array
    * per doc (`collect_list` partials combine map-side on the scan
    * partitioning), so the join back to `documents` for chunk slicing is
    * doc-keyed at N_docs cardinality — the document body is read once
    * and travels through exactly one co-partitioned join. ~len/[[CdcD]]
    * chunk rows per doc, each 5 narrow columns. */
  def cdcChunks(spark: SparkSession, sfDir: String,
      k: Int = CdcK, divisor: Int = CdcD): DataFrame =
    cdcChunkRows(spark, sfDir, k, divisor)
      .select("doc_id", "chunk_idx", "start_pos", "chunk_len", "chunk_hash")
      .orderBy("doc_id", "chunk_idx")

  /** [[cdcChunks]] without the presentation sort, plus the ledger key
    * `chunk_key` (FULL md5 hex of the chunk body — consumers that
    * re-aggregate and the dedup ledger use this; see
    * [[chunksFromStarts]] for why the 60-bit `chunk_hash` is display
    * only). */
  private def cdcChunkRows(spark: SparkSession, sfDir: String,
      k: Int, divisor: Int): DataFrame =
    // r16: materialized per (corpus, k, divisor) — FOUR queries share
    // this exact chunk relation per pass (chunk_cdc, dedup_chunks,
    // dedup_chunk_stats, dedup_chunk_canonical), each previously
    // re-running the corpus-sized gram pass + boundary aggregate +
    // slicing join ("the family constant": ~116-123 s apiece at sf10,
    // PERF.md r11). All six columns are primitive — parquet-exact.
    graft.sources.Scratch.materialize(spark,
        s"cdc_chunks:$k:$divisor:${graft.sources.Scratch.corpusKey(sfDir)}") {
      // r17: widened scan (guide §2.5) — the per-position gram-hash
      // pass is CPU-bound and the fixture layout provides fewer scan
      // tasks than cores (2 tasks on 32 cores at sf10: most of the
      // family's 53 s cold build)
      cdcChunkRowsFrom(Tables.documentsWide(spark, sfDir), k, divisor)
    }

  /** [[cdcChunkRows]] over any `(doc_id, text, …)` relation — shared
    * with the incremental chunk-ledger stream
    * ([[graft.streaming.ChunkLedgerStream]]), which chunks each
    * micro-batch with the IDENTICAL boundary rule so its ledger is
    * parity-gated equal to the batch ledger. */
  private[graft] def cdcChunkRowsFrom(docs0: DataFrame,
      k: Int = CdcK, divisor: Int = CdcD): DataFrame =
    chunksFromStarts(cdcBoundaries(docs0, k, divisor),
      concat(array(lit(0)), coalesce(col("bs"), array().cast("array<int>"))))

  /** `(doc_id, text, bs)` — each doc's sorted CDC boundary positions
    * (possibly null when no gram hash hits the divisor). */
  private def cdcBoundaries(docs0: DataFrame,
      k: Int, divisor: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val docs = docs0
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val grams = column(graft.plans.CharGrams(expression(col("text")), k))
    val bnd = docs
      .select(col("doc_id"), posexplode(grams).as(Seq("pos", "g")))
      .filter(col("pos") > 0 &&
        HashOps.wordHashN(col("g"), 15) % divisor === 0)
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("bs"))
    docs.join(bnd, Seq("doc_id"), "left")
  }

  /** Slice `(doc_id, text, bs)` into chunk rows given a start-position
    * derivation (`starts` must begin with 0 and be ascending).
    *
    * Two hash columns: `chunk_hash` (60-bit, compact display/join key
    * for the per-chunk TABLE) and `chunk_key` (the FULL 32-hex md5 of
    * the chunk body). The dedup LEDGER keys on `chunk_key`: at the
    * 100 TB posture (~1e12 ledger-sized chunks) 60-bit birthday
    * collisions are expected (~p=0.35 for one collision at 1e9 already)
    * and would silently conflate distinct chunks into one dup group —
    * the full md5 has the same shuffle posture as [[exact]]'s 32-byte
    * text-hash key (ADVICE r9). */
  private def chunksFromStarts(withBs: DataFrame, starts: Column): DataFrame = {
    // chunk i spans [starts[i], starts[i+1]) — last chunk to end of doc
    val chunkArr = transform(col("starts"), (s, i) => {
      val nxt = when(i + lit(2) <= size(col("starts")),
        element_at(col("starts"), i + lit(2))).otherwise(length(col("text")))
      struct(i.cast("long").as("chunk_idx"), s.cast("long").as("start_pos"),
        (nxt - s).cast("long").as("chunk_len"))
    })
    withBs
      .select(col("doc_id"), col("text"), starts.as("starts"))
      .select(col("doc_id"), col("text"), explode(chunkArr).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.start_pos").as("start_pos"), col("c.chunk_len").as("chunk_len"),
        HashOps.wordHashN(
          expr("substring(text, c.start_pos + 1, c.chunk_len)"), 15)
          .as("chunk_hash"),
        md5(expr("substring(text, c.start_pos + 1, c.chunk_len)")
          .cast("binary")).as("chunk_key"))
  }

  /** Minimum chunk size of [[cdcChunksMinSize]] (FastCDC's m). */
  val CdcMinSize = 32

  /** [[cdcChunks]] with FastCDC's min-size rule restored: walking each
    * document's candidate cuts left to right, a cut within [[CdcMinSize]]
    * chars of the previously KEPT cut is suppressed (FastCDC skips the
    * min-size region entirely — same greedy selection). The recursion
    * ("previous kept") that a window can't express becomes an explicit
    * left-to-right fold over the per-doc boundary ARRAY — Spark's
    * `aggregate` higher-order function with an array accumulator; the
    * oracle replays the same greedy selection as a recursive CTE (see
    * [[cdcMinSizeOracle]] for why not `list_reduce`). Both walks visit
    * the identical ascending positions, so the greedy outcome is
    * deterministic and engine-identical. Only the tail chunk may be
    * shorter than m. The fold is a narrow per-row expression over an
    * array that is ~len/[[CdcD]] long — no extra shuffle vs
    * [[cdcChunks]]. */
  def cdcChunksMinSize(spark: SparkSession, sfDir: String,
      minSize: Int = CdcMinSize): DataFrame = {
    val kept = aggregate(
      coalesce(col("bs"), array().cast("array<int>")),
      array(lit(0)),
      (acc, x) => when(x >= element_at(acc, lit(-1)) + lit(minSize),
        concat(acc, array(x))).otherwise(acc))
    chunksFromStarts(
      cdcBoundaries(Tables.documentsWide(spark, sfDir), CdcK, CdcD), kept)
      .select("doc_id", "chunk_idx", "start_pos", "chunk_len", "chunk_hash")
      .orderBy("doc_id", "chunk_idx")
  }

  /** DuckDB twin of [[cdcChunksMinSize]] — the greedy selection as a
    * RECURSIVE CTE: each level keeps, per doc, the smallest candidate
    * ≥ previous kept + m, so level count = max kept cuts per doc
    * (bounded by doc LENGTH, which does not grow with the corpus).
    *
    * Deliberately NOT `list_reduce`: DuckDB v1.0's list_reduce
    * miscomputes folds when list lengths vary across rows in a
    * vectorized batch (state leaks between rows — 210/500 wrong on a
    * synthetic varying-length corpus, reproduced while building this
    * oracle; correct when every row holds the identical list, which is
    * why a single-doc probe looks fine). And the recursion carries each
    * doc's boundary LIST in the working table rather than joining back
    * to `bh`: DuckDB inlines non-recursive CTEs, so a recursive term
    * that references the gram chain re-derives all the grams at EVERY
    * level (18 s vs 1 s at the gate, unbounded at sweep scale), while
    * `AS MATERIALIZED` silently breaks the recursion entirely in v1.0
    * (base rows only). With the list in-row, the expensive chain runs
    * exactly once, in the base case; each level is a pure
    * list_filter/list_aggregate over ~len/[[CdcD]] elements, and the
    * level count is bounded by document LENGTH — which does not grow
    * with the corpus. */
  def cdcMinSizeOracle: String = {
    val m = CdcMinSize
    s"""WITH RECURSIVE ${cdcOracleCtes()},
       |keep AS (
       |  SELECT d.doc_id, coalesce(bl.bs, []) AS bs, 0 AS kpos
       |  FROM d LEFT JOIN bl USING (doc_id)
       |  UNION ALL
       |  SELECT doc_id, bs,
       |         list_aggregate(list_filter(bs, b -> b >= kpos + $m), 'min') AS kpos
       |  FROM keep
       |  WHERE length(list_filter(bs, b -> b >= kpos + $m)) > 0
       |),
       |st2 AS (SELECT d.doc_id, d.text, ks.starts
       |        FROM d JOIN (SELECT doc_id, list_sort(list(kpos)) AS starts
       |                     FROM keep GROUP BY doc_id) ks USING (doc_id)),
       |cr2 AS (SELECT doc_id, text, starts,
       |               generate_subscripts(starts, 1) - 1 AS chunk_idx,
       |               unnest(starts) AS start_pos FROM st2),
       |cx2 AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |               CAST(start_pos AS BIGINT) AS start_pos,
       |               CAST(coalesce(starts[chunk_idx + 2], length(text)) - start_pos AS BIGINT) AS chunk_len,
       |               substring(text, start_pos + 1,
       |                         coalesce(starts[chunk_idx + 2], length(text)) - start_pos) AS chunk
       |        FROM cr2)
       |SELECT doc_id, chunk_idx, start_pos, chunk_len,
       |       (${HashOps.wordHashSqlN(15)}) AS chunk_hash
       |FROM (SELECT doc_id, chunk_idx, start_pos, chunk_len, md5(chunk) AS m
       |      FROM cx2)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Cross-document duplicate chunk groups over [[cdcChunks]]: chunk
    * hashes (≥ [[CdcMinDupLen]] chars) present in ≥ 2 distinct
    * documents, with doc and occurrence counts — the chunk-store dedup
    * ledger, and the span-level complement of [[substringDupStats]]'s
    * fixed-width windows. Distinct-doc counting is a two-level
    * aggregate ((key, doc) then key), never count-distinct's expand;
    * both shuffles carry the full-md5 `chunk_key` (32-byte keys — the
    * same posture as [[exact]]; see [[chunksFromStarts]] for why the
    * 60-bit hash cannot key a 100 TB ledger). */
  def chunkDupGroups(spark: SparkSession, sfDir: String,
      minLen: Long = CdcMinDupLen): DataFrame = {
    val per = cdcChunkRows(spark, sfDir, CdcK, CdcD)
      .filter(col("chunk_len") >= minLen)
      .groupBy("chunk_key", "doc_id")
      .agg(count(lit(1)).as("occ"), max("chunk_len").as("cl"))
    per.groupBy("chunk_key")
      .agg(max("cl").as("chunk_len"), count(lit(1)).as("n_docs"),
        sum("occ").as("n_occ"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_occ"), desc("n_docs"), col("chunk_key"))
  }

  /** Chunk-level dedup ACTION over [[chunkDupGroups]]'s ledger: for
    * every duplicate chunk group, the canonical occurrence to KEEP —
    * the first (lowest `doc_id`, then lowest `chunk_idx` within it)
    * among the group's members; every other occurrence is the
    * delta-compression candidate a CDC store replaces with a reference.
    * The cluster-level twin of [[canonical]], one level down.
    *
    * Scale shape: reuses the per-(key, doc) aggregate of the ledger —
    * `min(chunk_idx)` rides the same map-side combine — then one
    * `chunk_key`-keyed reduce; `min_by` picks the min-doc member without
    * a window or second shuffle. Persist/caller-releases contract as
    * [[chunkDupStats]]. */
  def chunkCanonical(spark: SparkSession, sfDir: String,
      minLen: Long = CdcMinDupLen): DataFrame = {
    val rows = cdcChunkRows(spark, sfDir, CdcK, CdcD)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val per = rows.filter(col("chunk_len") >= minLen)
      .groupBy("chunk_key", "doc_id")
      .agg(count(lit(1)).as("occ"), max("chunk_len").as("cl"),
        min("chunk_idx").as("mi"))
    per.groupBy("chunk_key")
      .agg(max("cl").as("chunk_len"), count(lit(1)).as("n_docs"),
        sum("occ").as("n_occ"),
        min("doc_id").as("keep_doc"), min_by(col("mi"), col("doc_id")).as("keep_idx"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_occ"), desc("n_docs"), col("chunk_key"))
  }

  /** DuckDB twin of [[chunkCanonical]]. */
  def chunkCanonicalOracle: String =
    s"""WITH ${cdcOracleCtes()},
       |per AS (SELECT chunk_key, doc_id, count(*) AS occ, max(chunk_len) AS cl,
       |               min(chunk_idx) AS mi
       |        FROM cxh WHERE chunk_len >= $CdcMinDupLen GROUP BY 1, 2)
       |SELECT chunk_key, CAST(max(cl) AS BIGINT) AS chunk_len,
       |       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occ,
       |       CAST(min(doc_id) AS BIGINT) AS keep_doc,
       |       CAST(arg_min(mi, doc_id) AS BIGINT) AS keep_idx
       |FROM per GROUP BY chunk_key HAVING count(*) >= 2
       |ORDER BY n_occ DESC, n_docs DESC, chunk_key""".stripMargin

  /** Per-document chunk-level duplication stats — the actionable
    * signal [[chunkDupGroups]]'s ledger implies, in the shape of
    * [[substringDupStats]]: for every document, how many of its
    * ledger-sized (≥ [[CdcMinDupLen]]) chunks also occur in ANOTHER
    * document, and what fraction of its bytes those chunks cover. A
    * doc with a high `dup_ppm` is chunk-level boilerplate — the
    * removal candidate a CDC dedup store would delta-compress away.
    * The fraction ships as integer PARTS-PER-MILLION (floor division)
    * rather than a rounded double: at sf1 the byte ratio landed
    * exactly on a decimal midpoint (0.0640625) where Spark rounds
    * HALF_UP and DuckDB HALF_EVEN — integer division has no ties.
    *
    * Scale shape: the chunk relation is computed ONCE and persisted
    * (three consumers: per-doc totals, the shared-hash ledger, the
    * per-doc dup rollup); cross-doc sharing is a distinct + count on
    * the full-md5 chunk key (never count-distinct's expand); every
    * join/agg is keyed on doc_id or chunk_key.
    *
    * Cache contract: the persisted chunk relation feeds three lazy arms
    * of the result plan and CANNOT be unpersisted here without
    * recomputing them — the caller owns releasing it
    * (`spark.catalog.clearCache()`) once the result is consumed, the
    * same contract as [[graft.operators.Similarity.sqTopK]]. Verify and
    * Bench already clear between queries. */
  def chunkDupStats(spark: SparkSession, sfDir: String,
      minLen: Long = CdcMinDupLen): DataFrame = {
    val rows = cdcChunkRows(spark, sfDir, CdcK, CdcD)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = rows.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("chunk_len").as("n_bytes"))
    val shared = rows.filter(col("chunk_len") >= minLen)
      .select("chunk_key", "doc_id").distinct()
      .groupBy("chunk_key").agg(count(lit(1)).as("ddf"))
      .filter(col("ddf") >= 2).select("chunk_key")
    val dup = rows.filter(col("chunk_len") >= minLen)
      .join(shared, "chunk_key")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_chunks"), sum("chunk_len").as("dup_bytes"))
    tot.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"), col("n_bytes"),
        coalesce(col("n_dup_chunks"), lit(0L)).as("n_dup_chunks"),
        coalesce(col("dup_bytes"), lit(0L)).as("dup_bytes"),
        expr("coalesce(dup_bytes, 0L) * 1000000L div greatest(n_bytes, 1L)")
          .as("dup_ppm"))
      .orderBy("doc_id")
  }

  /** DuckDB twin of [[chunkDupStats]]. */
  def chunkDupStatsOracle: String =
    s"""WITH ${cdcOracleCtes()},
       |tot AS (SELECT doc_id, count(*) AS n_chunks, sum(chunk_len) AS n_bytes
       |        FROM cxh GROUP BY doc_id),
       |sh AS (SELECT chunk_key FROM (SELECT DISTINCT chunk_key, doc_id
       |                               FROM cxh WHERE chunk_len >= $CdcMinDupLen)
       |       GROUP BY chunk_key HAVING count(*) >= 2),
       |dup AS (SELECT doc_id, count(*) AS n_dup_chunks, sum(chunk_len) AS dup_bytes
       |        FROM cxh JOIN sh USING (chunk_key)
       |        WHERE chunk_len >= $CdcMinDupLen GROUP BY doc_id)
       |SELECT tot.doc_id, CAST(tot.n_chunks AS BIGINT) AS n_chunks,
       |       CAST(tot.n_bytes AS BIGINT) AS n_bytes,
       |       CAST(coalesce(dup.n_dup_chunks, 0) AS BIGINT) AS n_dup_chunks,
       |       CAST(coalesce(dup.dup_bytes, 0) AS BIGINT) AS dup_bytes,
       |       CAST(coalesce(dup.dup_bytes, 0) * 1000000
       |            // greatest(tot.n_bytes, 1) AS BIGINT) AS dup_ppm
       |FROM tot LEFT JOIN dup USING (doc_id) ORDER BY doc_id""".stripMargin

  /** DuckDB CTE chain (no leading WITH) ending in `cxh(doc_id,
    * chunk_idx, start_pos, chunk_len, chunk_hash)` — the CDC chunk
    * relation at [[cdcChunks]]'s defaults. Shared by the `chunk_cdc`
    * and `dedup_chunks` oracles so both replay the identical boundary
    * derivation. */
  private def cdcOracleCtes(k: Int = CdcK, divisor: Int = CdcD): String =
    s"""d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |g0 AS (SELECT doc_id, CASE WHEN length(text) >= $k
       |         THEN list_transform(generate_series(1, length(text) - ${k - 1}),
       |                             i -> substring(text, i, $k))
       |         ELSE [] END AS gs FROM d),
       |g1 AS (SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos, unnest(gs) AS g FROM g0),
       |bh AS (SELECT doc_id, pos
       |       FROM (SELECT doc_id, pos, md5(g) AS m FROM g1)
       |       WHERE (${HashOps.wordHashSqlN(15)}) % $divisor = 0 AND pos > 0),
       |bl AS (SELECT doc_id, list_sort(list(pos)) AS bs FROM bh GROUP BY doc_id),
       |st AS (SELECT d.doc_id, d.text,
       |              list_concat([0], coalesce(bl.bs, [])) AS starts
       |       FROM d LEFT JOIN bl USING (doc_id)),
       |cr AS (SELECT doc_id, text, starts,
       |              generate_subscripts(starts, 1) - 1 AS chunk_idx,
       |              unnest(starts) AS start_pos FROM st),
       |cx AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |              CAST(start_pos AS BIGINT) AS start_pos,
       |              CAST(coalesce(starts[chunk_idx + 2], length(text)) - start_pos AS BIGINT) AS chunk_len,
       |              substring(text, start_pos + 1,
       |                        coalesce(starts[chunk_idx + 2], length(text)) - start_pos) AS chunk
       |       FROM cr),
       |cxh AS (SELECT doc_id, chunk_idx, start_pos, chunk_len,
       |               (${HashOps.wordHashSqlN(15)}) AS chunk_hash, m AS chunk_key
       |        FROM (SELECT doc_id, chunk_idx, start_pos, chunk_len, md5(chunk) AS m
       |              FROM cx))""".stripMargin

  /** DuckDB twin of [[cdcChunks]]. */
  def cdcChunksOracle: String =
    s"""WITH ${cdcOracleCtes()}
       |SELECT doc_id, chunk_idx, start_pos, chunk_len, chunk_hash
       |FROM cxh ORDER BY doc_id, chunk_idx""".stripMargin

  /** DuckDB twin of [[chunkDupGroups]] (defaults minLen=20). */
  def chunkDupOracle: String =
    s"""WITH ${cdcOracleCtes()},
       |per AS (SELECT chunk_key, doc_id, count(*) AS occ, max(chunk_len) AS cl
       |        FROM cxh WHERE chunk_len >= $CdcMinDupLen GROUP BY 1, 2)
       |SELECT chunk_key, CAST(max(cl) AS BIGINT) AS chunk_len,
       |       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occ
       |FROM per GROUP BY chunk_key HAVING count(*) >= 2
       |ORDER BY n_occ DESC, n_docs DESC, chunk_key""".stripMargin

  // ----------------------------------------------------- embedding cosine

  /** Embedding-cosine near-dup pairs (cos ≥ threshold). Exact O(N²)
    * pairwise at test scale; the LSH-bucketed scale path is
    * [[Similarity.ivfTopK]]'s coarse quantization — at 100 TB, run
    * assignment first and only pair within buckets.
    *
    * `keepMod`: deterministic sample restriction (vec_id % keepMod = 0)
    * applied to BOTH join sides — the `dedup_cosine_sampled` twin that
    * keeps the DuckDB replay tractable at sweep scale factors where the
    * full O(N²) oracle is too slow (sf1+): same kernels, same join,
    * same rounding, 1/keepMod² of the pairs. */
  def cosineNearDup(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4, keepMod: Option[Long] = None): DataFrame = {
    // norms precomputed once per row (N values), so each of the O(N²)
    // pairs pays exactly one dot-product kernel — same arithmetic as
    // cosine() (norm = sqrt(dot(v,v)) bit-identically), 3× less work
    val p0 = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val p = keepMod.foldLeft(p0)((d, m) => d.filter(col("vec_id") % m === 0))
      .select(col("vec_id"), col("v"), VectorOps.l2norm(col("v")).as("nrm"))
    val cos = VectorOps.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    p.as("a").join(p.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), cos.as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): duplicate pairs are searched only WITHIN each
    * cluster of the frozen converged k-means fit
    * ([[graft.kmeans.FitFinal]] 'fit' variant — the same centroids the
    * `kmeans_fit_final` oracle verifies), so pair work is Σ n_c² instead
    * of N². This is the scale path over [[cosineNearDup]]'s exact
    * all-pairs baseline: grow k ∝ N (the paper runs 50k clusters on
    * LAION) and per-cluster buckets stay bounded, one cid shuffle plus
    * bounded equi-join work at any corpus size.
    *
    * Decision rule, fully deterministic: for each within-cluster pair
    * with cos ≥ `threshold`, the member with the HIGHER
    * (cos-to-assigned-centroid, vec_id) is marked removed — SemDeDup's
    * keep-low-centroid-similarity choice with a total tie-break. Output
    * is the removal decision record: one row per removed vector,
    * (vec_id, cluster_id, cos_centroid, n_dups = pairs it lost).
    * Assumes no zero vectors (cosine undefined); the fixtures hold none.
    */
  def semanticDedup(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame =
    semanticFromCentroids(spark, sfDir,
      graft.kmeans.FitFinal.result(spark, sfDir, "fit")
        .centroids.sortBy(_._1).map(_._2), threshold)

  /** [[semanticDedup]]'s k∝N form: buckets from a FRESH capped-iteration
    * fit with caller-chosen k instead of the frozen k=8 oracle fit.
    * Bucketing quality needs no convergence (SemDeDup's clustering is a
    * partitioner, not an estimand), so a handful of Lloyd rounds
    * suffices; growing k with the corpus holds per-cluster pair work at
    * N²/k — the knob that keeps the operator linear-ish at 100 TB while
    * the k=8 twin stays pinned to the DuckDB oracle at gate scale.
    * `k = 1` degenerates to the exact all-pairs baseline (spec-pinned
    * equal to [[cosineNearDup]]-derived removals). */
  def semanticDedupScaled(spark: SparkSession, sfDir: String, k: Int,
      maxIter: Int = 5, threshold: Double = 0.4): DataFrame =
    semanticFromCentroids(spark, sfDir,
      trainBuckets(spark, sfDir, k, maxIter), threshold)

  /** ~1 bucket per 2500 vectors, floor 8 — the k∝N schedule
    * `dedup_semantic_scaled` runs: gate fixtures (500 vecs) stay at the
    * oracle-friendly k=8; the sf10 probe (200k vecs) gets k=80. */
  def scaledK(n: Long): Int = math.max(8L, (n + 2499) / 2500).toInt

  /** Bucketing centroids: ONE hash-ordered top-k pass for seeds (no k
    * sequential seeding scans — [[graft.kmeans.RefKMeans.seed]]'s scale
    * bound does not apply), then `maxIter` capped Lloyd rounds. A
    * partitioner needs no convergence; 5 rounds give stable buckets. */
  private def trainBuckets(spark: SparkSession, sfDir: String, k: Int,
      maxIter: Int): Array[Array[Double]] = {
    val pts = Tables.points(spark, sfDir)
    val seeds = pts
      .orderBy(xxhash64(col("id"), lit(4242L)), col("id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    val cfg = graft.kmeans.RefKMeans.Config(k = k, maxIter = maxIter,
      initialCentroids = Some(seeds))
    graft.kmeans.RefKMeans.fit(pts, cfg).centroids.sortBy(_._1).map(_._2)
  }

  /** [[semanticDedupScaled]] with the [[scaledK]] schedule — the
    * `queries` entry. Trained centroids land in a registry so the
    * oracle dump can carry the identical literals (run-then-dump, the
    * [[graft.kmeans.FitFinal]] contract). */
  def semanticDedupAuto(spark: SparkSession, sfDir: String): DataFrame =
    semanticFromCentroids(spark, sfDir, scaledCentroids(spark, sfDir),
      threshold = 0.4)

  /** Registry-backed [[scaledK]]-schedule bucketing centroids for
    * `sfDir`: trained once per JVM (deterministic — one-pass seeds +
    * capped Lloyd), shared by [[semanticDedupAuto]] and
    * [[semanticRecall]] so the oracle literals match whichever query
    * runs first. */
  private[operators] def scaledCentroids(spark: SparkSession,
      sfDir: String): Array[Array[Double]] = {
    val regHit = scaledReg.contains(sfDir)
    val cs = scaledReg.getOrElseUpdate(sfDir, {
      val k = scaledK(Tables.points(spark, sfDir).count())
      trainBuckets(spark, sfDir, k, maxIter = 5)
    })
    graft.sources.CacheProbe.record(s"semdedup:$sfDir", built = !regHit)(
      { scaledReg.remove(sfDir); () })
    lastScaledDir = Some(sfDir)
    cs
  }

  private val scaledReg =
    scala.collection.concurrent.TrieMap.empty[String, Array[Array[Double]]]
  @volatile private var lastScaledDir: Option[String] = None

  /** Bucketing recall of BOTH semantic-dedup paths vs the exact
    * all-pairs sweep: what fraction of [[cosineNearDup]]'s pairs lands
    * within one bucket under (a) the frozen k=8 fit and (b) the
    * [[scaledK]] schedule. SemDeDup's known tradeoff is the
    * cross-cluster pair it never examines — this query makes that loss
    * a measured, oracle-checked number (the [[Similarity]] `ann_recall`
    * convention). Contains the exact O(N²) baseline by construction, so
    * it shares `dedup_cosine`'s declared scale contract (probe-excluded
    * above gate scale).
    *
    * `keepMod`: the `dedup_cosine_sampled` device — restrict the exact
    * pair sweep to vec_id % keepMod = 0 on BOTH sides so the recall of
    * the [[scaledK]] schedule stays oracle-measurable at sf1+ where k
    * actually grows (k=8→80) but the full N² sweep is intractable. The
    * bucketings under test (frozen k=8 fit, k∝N schedule) still come
    * from the FULL corpus — sampling thins the measured pair set, not
    * the thing being measured. */
  def semanticRecall(spark: SparkSession, sfDir: String,
      keepMod: Option[Long] = None): DataFrame = {
    val frozen = graft.kmeans.FitFinal.result(spark, sfDir, "fit")
      .centroids.sortBy(_._1).map(_._2)
    val scaled = scaledCentroids(spark, sfDir)
    val assign0 = Tables.points(spark, sfDir).select(col("id"),
      VectorOps.nearestCidK(col("features"), frozen).as("cf"),
      VectorOps.nearestCidK(col("features"), scaled).as("cs"))
    // only sampled ids can appear in sampled pairs — pre-filter the
    // assignment side too so the join probes N/keepMod rows, not N
    val assign = keepMod.foldLeft(assign0)((d, m) => d.filter(col("id") % m === 0))
    cosineNearDup(spark, sfDir, keepMod = keepMod).select("vec_a", "vec_b")
      .join(assign.select(col("id").as("vec_a"),
        col("cf").as("cfa"), col("cs").as("csa")), "vec_a")
      .join(assign.select(col("id").as("vec_b"),
        col("cf").as("cfb"), col("cs").as("csb")), "vec_b")
      .agg(
        count(lit(1)).as("n_exact"),
        sum(when(col("cfa") === col("cfb"), 1L).otherwise(0L)).as("n_frozen"),
        sum(when(col("csa") === col("csb"), 1L).otherwise(0L)).as("n_scaled"))
      .select(col("n_exact"), col("n_frozen"), col("n_scaled"),
        round(col("n_frozen") / col("n_exact"), 6).as("recall_frozen"),
        round(col("n_scaled") / col("n_exact"), 6).as("recall_scaled"))
  }

  private def semanticFromCentroids(spark: SparkSession, sfDir: String,
      cs: Array[Array[Double]], threshold: Double): DataFrame =
    semanticFromPoints(Tables.points(spark, sfDir), cs, threshold)

  /** Pipeline over an explicit (id, features) relation — the injection
    * point the retry-chaos gate wraps (production entry points pass the
    * sfDir tables). */
  private[operators] def semanticFromPoints(points: DataFrame,
      cs: Array[Array[Double]], threshold: Double): DataFrame = {
    // cos to the ASSIGNED centroid: k literal dots per row picked by the
    // argmin kernel's cid — same per-row cost class as the assignment
    // itself, no join, no shuffle
    val cosC = element_at(
      array(cs.map { c =>
        val cl = array(c.toIndexedSeq.map(lit(_)): _*)
        VectorOps.dot(col("v"), cl) / (col("nrm") * VectorOps.l2norm(cl))
      }.toIndexedSeq: _*), col("cid") + 1)
    val a = points
      .select(col("id").as("vec_id"), col("features").as("v"),
        VectorOps.l2norm(col("features")).as("nrm"),
        VectorOps.nearestCidK(col("features"), cs).as("cid"))
      .withColumn("cosc", cosC)
    val cos = VectorOps.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    val pairs = a.as("a").join(a.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(cos >= threshold)
    // explicit lexicographic (cosc, vec_id) dominance — written as plain
    // boolean algebra so the DuckDB oracle states the identical rule
    val aLoses = col("a.cosc") > col("b.cosc") ||
      (col("a.cosc") === col("b.cosc") && col("a.vec_id") > col("b.vec_id"))
    pairs
      .select(
        when(aLoses, struct(col("a.vec_id").as("vec_id"),
            col("a.cid").as("cid"), col("a.cosc").as("cosc")))
          .otherwise(struct(col("b.vec_id").as("vec_id"),
            col("b.cid").as("cid"), col("b.cosc").as("cosc"))).as("r"))
      .select(col("r.vec_id").as("vec_id"),
        col("r.cid").cast("long").as("cluster_id"), col("r.cosc").as("cosc"))
      .groupBy("vec_id", "cluster_id")
      .agg(round(max("cosc"), 6).as("cos_centroid"),
        count(lit(1)).as("n_dups"))
      .orderBy("vec_id")
  }

  /** DuckDB oracles for [[semanticDedup]] and [[semanticDedupAuto]],
    * carrying each pipeline's centroids as literals — same run-then-dump
    * contract as [[graft.kmeans.FitFinal.oracleSqls]] (entries appear
    * only after the corresponding query ran in this JVM). */
  def semanticOracleSqls: Map[String, String] = {
    val frozen = graft.kmeans.FitFinal.frozenFitCentroids
      .map(cs => Map("dedup_semantic" -> semanticSql(cs.map(_._2))))
      .getOrElse(Map.empty)
    val scaled = lastScaledDir.flatMap(scaledReg.get)
      .map(cs => Map("dedup_semantic_scaled" -> semanticSql(cs)))
      .getOrElse(Map.empty)
    val recall = for {
      f <- graft.kmeans.FitFinal.frozenFitCentroids
      s <- lastScaledDir.flatMap(scaledReg.get)
    } yield Map(
      "dedup_semantic_recall" -> recallSql(f.map(_._2), s),
      "dedup_semantic_recall_sampled" ->
        recallSql(f.map(_._2), s, keepMod = Some(5L)))
    frozen ++ scaled ++ recall.getOrElse(Map.empty)
  }

  private def centsValues(cs: Array[Array[Double]], name: String): String =
    cs.zipWithIndex.map { case (v, cid) =>
      v.map(java.lang.Double.toString).mkString(s"($cid, CAST([", ", ", "] AS DOUBLE[]))")
    }.mkString(s"$name AS (SELECT * FROM (VALUES ", ", ", ") AS t(cid, c))")

  private def recallSql(frozen: Array[Array[Double]],
      scaled: Array[Array[Double]], keepMod: Option[Long] = None): String = {
    val keep = keepMod
      .map(m => s"a.vec_id % $m = 0 AND b.vec_id % $m = 0 AND ")
      .getOrElse("")
    def cosSql(x: String, y: String) =
      s"list_inner_product($x, $y) / (sqrt(list_inner_product($x, $x)) * sqrt(list_inner_product($y, $y)))"
    def assignCte(cents: String, out: String) =
      s"""$out AS (SELECT vec_id, cid FROM (
         |  SELECT p.vec_id, c.cid,
         |         row_number() OVER (PARTITION BY p.vec_id
         |                            ORDER BY list_distance(p.v, c.c), c.cid) AS rn
         |  FROM pts p CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    s"""WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${centsValues(frozen, "cf")},
       |${centsValues(scaled, "cs2")},
       |prs AS (SELECT a.vec_id AS va, b.vec_id AS vb
       |        FROM pts a JOIN pts b ON a.vec_id < b.vec_id
       |        WHERE $keep${cosSql("a.v", "b.v")} >= 0.4),
       |${assignCte("cf", "af")},
       |${assignCte("cs2", "asc2")}
       |SELECT CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN fa.cid = fb.cid THEN 1 ELSE 0 END) AS BIGINT) AS n_frozen,
       |       CAST(sum(CASE WHEN sa.cid = sb.cid THEN 1 ELSE 0 END) AS BIGINT) AS n_scaled,
       |       round(sum(CASE WHEN fa.cid = fb.cid THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS recall_frozen,
       |       round(sum(CASE WHEN sa.cid = sb.cid THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS recall_scaled
       |FROM prs
       |JOIN af fa ON fa.vec_id = prs.va
       |JOIN af fb ON fb.vec_id = prs.vb
       |JOIN asc2 sa ON sa.vec_id = prs.va
       |JOIN asc2 sb ON sb.vec_id = prs.vb""".stripMargin
  }

  private def semanticSql(cs: Array[Array[Double]]): String = {
      val cents = centsValues(cs, "cents")
      def cosSql(x: String, y: String) =
        s"list_inner_product($x, $y) / (sqrt(list_inner_product($x, $x)) * sqrt(list_inner_product($y, $y)))"
      s"""WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |$cents,
           |d AS (SELECT p.vec_id, p.v, c.cid, list_distance(p.v, c.c) AS dist,
           |             ${cosSql("p.v", "c.c")} AS cosc
           |      FROM pts p CROSS JOIN cents c),
           |a AS (SELECT vec_id, v, cid, cosc FROM (
           |        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |        FROM d) WHERE rn = 1),
           |hits AS (SELECT x.cid, x.vec_id AS va, x.cosc AS ca, y.vec_id AS vb, y.cosc AS cb
           |         FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
           |         WHERE ${cosSql("x.v", "y.v")} >= 0.4),
           |rem AS (SELECT CASE WHEN ca > cb OR (ca = cb AND va > vb) THEN va ELSE vb END AS vec_id,
           |               cid,
           |               CASE WHEN ca > cb OR (ca = cb AND va > vb) THEN ca ELSE cb END AS cosc
           |        FROM hits)
           |SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id,
           |       round(max(cosc), 6) AS cos_centroid, count(*) AS n_dups
           |FROM rem GROUP BY vec_id, cid ORDER BY vec_id""".stripMargin
  }
}
