#!/usr/bin/env python3
"""Automatic standalone re-measure for scale-probe outliers.

The in-pass sf10 probe over-reports growth for late queries (heap/GC
debris accumulates in the one shared JVM — PERF.md "sf10 probe (r7)");
round 9 adjudicated two such queries (text_chargrams 111x, text_winnow
105x in-pass, both linear standalone) by hand. This script closes that
blind spot mechanically (VERDICT r9 task 8): every query whose in-pass
ratio exceeds the data-growth factor is re-measured STANDALONE at both
scale points (array_funcs prefixed to absorb JIT warmup), and the
standalone numbers land in a JSON record next to the probe result — so
PERF.md's "linear-or-better" claim is backed per-query without manual
adjudication.

Usage: probe_remeasure.py PROBE_JSON REF_JSON GROWTH OUT_JSON \
           PROBE_SF_DIR REF_SF_DIR
  PROBE_JSON  bench record at the probe scale (e.g. the sf10 run's
              BENCH_RESULT.json — COPY it first: subset re-runs
              overwrite that fixed path)
  REF_JSON    bench record at the reference scale (e.g. BENCH_LAST_sf1.json)
  GROWTH      data growth factor between the two records (e.g. 10)

Queries under 0.2 s at the reference scale are ratio-tested against a
0.2 s floor (per-task scheduling noise dominates below it).
"""
import json
import os
import subprocess
import sys


def bench(sf_dir, only, shuffle_parts, repo="/root/repo"):
    """One subset bench run; returns its query->sec map.

    `shuffle_parts` must MATCH the config of the in-pass record the
    anchor adjudicates (probe leg: the probe's 200; ref leg: the full
    sf1 run's 32). Through round 13 both legs ran the 32 default while
    the probe ran 200 — the entire "kcore 121.6 s in-pass vs 38.9 s
    standalone" inflation was that config mismatch, not JVM debris
    (r14 measurement: fresh JVM, same data — 146.5 s at 200 partitions
    vs 50.8 s at 32; PERF.md "sf10 shared-pass inflation, resolved").
    """
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_SHUFFLE_PARTITIONS=str(shuffle_parts),
               SPARK_GRAFT_ONLY=",".join(["array_funcs"] + sorted(only)))
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=repo, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(os.path.join(repo, "BENCH_RESULT.json")) as f:
        rec = json.load(f)
    return rec.get("queries", {})


def main():
    probe_json, ref_json, growth, out_json, probe_dir, ref_dir = sys.argv[1:7]
    # per-leg shuffle-partition configs (argv 7/8), defaulting to the
    # probe harness's conventions: sf10 probe at 200, sf1 full run at 32
    probe_parts = sys.argv[7] if len(sys.argv) > 7 else "200"
    ref_parts = sys.argv[8] if len(sys.argv) > 8 else "32"
    growth = float(growth)
    probe = json.load(open(probe_json)).get("queries", {})
    ref = json.load(open(ref_json)).get("queries", {})
    outliers = sorted(
        q for q, t in probe.items()
        if q in ref and t > growth * max(ref[q], 0.2))
    record = {"growth": growth, "outliers": {}, "probe": probe_json,
              "ref": ref_json}
    if outliers:
        print(f"[remeasure] {len(outliers)} over-growth queries: {outliers}")
        probe_alone = bench(probe_dir, outliers, probe_parts)
        ref_alone = bench(ref_dir, outliers, ref_parts)
        for q in outliers:
            pa, ra = probe_alone.get(q), ref_alone.get(q)
            record["outliers"][q] = {
                "inpass_probe": probe[q], "inpass_ref": ref[q],
                "inpass_ratio": round(probe[q] / max(ref[q], 1e-9), 2),
                "standalone_probe": pa, "standalone_ref": ra,
                "standalone_ratio":
                    round(pa / max(ra, 1e-9), 2) if pa and ra else None,
            }
    else:
        print("[remeasure] no query exceeds the data-growth factor in-pass")
    with open(out_json, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"[remeasure] wrote {out_json}")


if __name__ == "__main__":
    main()
