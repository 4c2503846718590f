#!/bin/bash
# sf10 scale probe: run the bench at 100x the sf0.1 bench fixture
# (1000x the sf0.01 correctness gate) — the strongest in-sandbox answer
# to "would this plan survive a 100x scale-up".
#
# Derives /tmp/sf10 from /tmp/sf1 via ScaleUp if either is missing
# (ScaleUp widens key columns and refuses on overflow), then runs the
# full bench there. The declared-quadratic/fixed-k baselines are
# excluded BY CONTRACT (dedup_cosine ~100x pairs ≈ 1.6 h, join_theta
# ~30 min, dedup_semantic N²/8 pair work at fixed k=8,
# dedup_semantic_recall's full exact sweep); their designed scale legs
# stay in (%5-sampled oracle twins incl. ann_recall_sampled and
# dedup_semantic_recall_sampled — sample-quadratic by declared
# contract, 1/25 of the full pair work — and dedup_semantic_scaled's
# k∝N schedule, measured 10.6x wall for 10x corpus at sf1→sf10, r8).
# r9 adds the winnowing legs (text_winnow, dedup_winnow) to the set.
#
# Measurement caveat (PERF.md "sf10 probe (r7)"): in-pass ratios
# over-report growth for late queries — prior heavy queries leave
# heap/GC debris in the one shared JVM. Before calling a query
# superlinear, re-measure BOTH scale points standalone:
#   SPARK_GRAFT_ONLY=array_funcs,<q> (array_funcs absorbs JIT warmup).
set -e
cd /root/repo
SF10=${SPARK_GRAFT_SF10_DIR:-/tmp/sf10}
if [[ ! -f "$SF10/lineitem.parquet/_SUCCESS" ]]; then
  if [[ ! -f /tmp/sf1/lineitem.parquet/_SUCCESS ]]; then
    echo "[probe] deriving /tmp/sf1 (10x) from the sf0.1 fixture"
    sbt -batch "runMain graft.sources.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
  fi
  echo "[probe] deriving $SF10 (10x) from /tmp/sf1"
  sbt -batch "runMain graft.sources.ScaleUp /tmp/sf1 $SF10 10"
fi
# 24g heap (vs the 8g default): the r9 probe's ~3400 s cumulative pass
# exhausted the 8g JVM partway through — the context died at text_winnow
# (which passes standalone at sf10 in 266 s) and every later query
# "failed" in ~20 ms. Full output tees to a log so BENCH FAIL lines are
# never swallowed by the JSON grep again.
env SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=200 \
    SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
    SPARK_GRAFT_SKIP=dedup_cosine,join_theta,dedup_semantic,dedup_semantic_recall \
    sbt -batch "runMain graft.Bench" 2>&1 | tee /tmp/probe_sf10.log | grep -o '{"metric".*'
# preserve the probe record (subset re-runs overwrite BENCH_RESULT.json),
# then auto-re-measure every over-data-growth query STANDALONE at both
# scale points (VERDICT r9 task 8 — retires the in-pass ratio blind spot
# for linear-CPU queries without manual adjudication)
cp BENCH_RESULT.json /tmp/probe_sf10_result.json
# fold this probe into the monotone matched-config floor record
# (Bench.scala's own min maintenance skips SKIP/200p runs by design;
# all sf10 probes share the 200p/24g convention, so they are
# min-comparable — VERDICT r14 task 1). The label is canonical (sf10,
# not the fixture path — ADVICE r15), and the config string names the
# multi-file fixture layout the r16 floors were re-based on.
python3 scripts/build_min_record.py BENCH_MIN_sf10.json \
  "$(basename "$SF10")" /tmp/probe_sf10_result.json \
  --config "local[32], shuffle=200, driver 24g, multi-file fixture (scale_probe.sh)"
if [[ -f BENCH_LAST_sf1.json ]]; then
  # each standalone anchor runs under the SAME partition config as the
  # in-pass record it adjudicates (probe leg 200, sf1 ref leg 32) — the
  # r13 mismatch (probe at 200, anchors at the 32 default) invented a
  # 3x "kcore in-pass inflation" that was pure per-task scheduling
  # arithmetic (PERF.md r14)
  env SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
    python3 scripts/probe_remeasure.py /tmp/probe_sf10_result.json \
      BENCH_LAST_sf1.json 10 /tmp/probe_sf10_remeasure.json "$SF10" /tmp/sf1 200 32
fi
