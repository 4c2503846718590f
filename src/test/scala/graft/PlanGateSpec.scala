package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene GATE: every query's executed (AQE-final) plan must be
  * free of CartesianProduct and BroadcastNestedLoopJoin — the two
  * operators that turn into O(N·M) scans at cluster scale — unless the
  * query DECLARES the shape below with a justification. Promoted from
  * the manual `runMain graft.PlanAudit` sweep so a refactor that
  * degrades a join to NLJ fails `sbt test`, not a human's memory. */
class PlanGateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  /** Queries whose NLJ/cartesian is intentional AND bounded — each with
    * the reason the shape is safe at scale. Everything else must plan
    * equi-joins (or no joins) only. */
  val declared: Map[String, String] = Map(
    "cross_join" -> "the operator under test IS a cartesian (5x25 dims)",
    "join_theta" -> "the operator under test IS a non-equi theta join",
    "ann_brute_topk" -> "exact baseline: query batch (10 rows) broadcast against the corpus by design",
    "ann_hard_negatives" -> "band-filtered brute scan: same broadcast-query-batch shape (the band prunes before the top-k heaps)",
    "ann_sq_topk" -> "quantized exact scan: same broadcast-query-batch shape as brute",
    "rag_retrieve" -> "passage retrieval: broadcast-query-batch scan (5 passage vectors) against the passage corpus, brute's declared shape",
    "rag_bm25" -> "1-row corpus-stats aggregate (N, L) broadcast-cross-joined onto the posting-intersection scores",
    "rag_hybrid" -> "contains the dense leg's declared broadcast-query-batch scan + the BM25 leg's 1-row stats cross-join",
    "rag_mmr" -> "contains the dense leg's declared broadcast-query-batch scan; the MMR stages themselves are equi-joins on the qxR candidate relation",
    "dq_expectations" -> "the 1-row single-pass and referential rule summaries cross-join 1x1 into the rule rows",
    "lake_skipping" -> "1-row box-bounds aggregate broadcast-cross-joined onto both layout simulations (the bloomSemiStats shape)",
    "basket_rules" -> "1-row basket-count aggregate broadcast-cross-joined onto the brand-squared rule relation",
    "ann_pq_topk" -> "PQ code scan: same broadcast-query-batch shape as brute (8 bytes/vector at scale)",
    "ann_recall" -> "evaluation harness over brute/sq (their NLJs) + 1-row count cross-joins",
    "ann_recall_sampled" -> "same harness over the %5-sampled corpus (its own quantizers) so recall stays oracle-checked at sf1+",
    "dedup_recall" -> "1-row count aggregates cross-joined into the single metric row",
    "join_bloom" -> "1-row stats aggregates cross-joined into the single metric row (the bloom test itself is a narrow scan)",
    "graph_triangles" -> "1-row census aggregates cross-joined into the single metric row (the wedge/closing joins are equi-joins)",
    "dedup_cosine" -> "exact all-pairs cosine baseline (the LSH/banded paths are the scale route)",
    "dedup_cosine_sampled" -> "the same declared-quadratic baseline, %5-sample-restricted so its oracle runs at every sweep sf",
    "dedup_semantic_recall" -> "recall eval contains the exact all-pairs baseline by construction (dedup_cosine's declared contract)",
    "dedup_semantic_recall_sampled" -> "same eval, %5-sample-restricted pair sweep so the schedule's recall stays oracle-checked at sf1+",
    "kmeans_dbi" -> "k x k centroid-pair relation - k rows, never data-sized",
    "sample_importance" -> "1-row token-totals aggregate broadcast-cross-joined onto the ratio projection",
    "text_collocations" -> "1-row token-total aggregate broadcast-cross-joined onto the pruned bigram relation",
    "ts_changepoint" -> "1-row (n, T) series-stats aggregate broadcast-cross-joined onto the hours-sized CUSUM relation",
    "ann_matryoshka" -> "one broadcast-query-batch scan per prefix dim (brute's declared shape) + the 1-row truth-count cross-join",
    "sample_mixture" -> "1-row total-weight aggregate broadcast-cross-joined onto the sources-sized quota relation",
    "dq_drift" -> "1-row (n_a, n_b) window-totals aggregate broadcast-cross-joined onto the grid-sized ECDF relation",
    "text_heaps" -> "1-row derived-bucket-width aggregate broadcast-cross-joined onto the corpus scan (bounds the growth curve at HeapsMaxBuckets rows at any scale)")

  test("no undeclared query plans a cartesian product or nested-loop join") {
    val offenders = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = PlanAudit.finalPlanString(fn(spark, sf))
      val nlj = PlanAudit.opCount(p, "BroadcastNestedLoopJoin")
      val cart = PlanAudit.opCount(p, "CartesianProduct")
      if (nlj + cart > 0 && !declared.contains(name))
        offenders += s"$name (nlj=$nlj cart=$cart)"
      spark.catalog.clearCache()
    }
    assert(offenders.result().isEmpty,
      s"undeclared NLJ/cartesian plans: ${offenders.result().mkString(", ")} — " +
        "fix the join or declare it in PlanGateSpec.declared with a justification")
  }

  test("declared entries are live: every allowlisted query still plans its NLJ") {
    // a stale allowlist entry is a hole in the gate — if a declared
    // query stops planning an NLJ (e.g. got rewritten), drop it
    val stale = declared.keys.toSeq.sorted.filter { name =>
      val p = PlanAudit.finalPlanString(SparkEntry.queries(name)(spark, sf))
      spark.catalog.clearCache()
      PlanAudit.opCount(p, "BroadcastNestedLoopJoin") +
        PlanAudit.opCount(p, "CartesianProduct") == 0
    }
    assert(stale.isEmpty, s"declared but NLJ-free (remove from allowlist): $stale")
  }
}
