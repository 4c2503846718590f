#!/usr/bin/env python3
"""Build/refresh an elementwise-min bench floor record (BENCH_MIN_*.json)
from a set of MATCHED-CONFIG bench records.

Bench.scala maintains BENCH_MIN_sf0.1/sf1.json itself, but only for
full default-config runs (shuffle partitions == cpus, no ONLY/SKIP
subset) — the sf10 probe convention (200 shuffle partitions, 24g
driver heap, SKIP for the declared-quadratic baselines, scale_probe.sh)
never qualifies, so sf10 had per-round probe records but no monotone
floor anchor (VERDICT r14 task 1). This script closes that: it takes
any number of bench records produced under ONE config convention and
writes the elementwise minimum of their per-query successful timings.

Only records that are config-comparable may be folded together — for
sf10 that is BENCH_SF10_r10+ (r10 introduced the 24g heap; 200
partitions since r8) and SPARK_GRAFT_ONLY subset re-measures run with
the same env. Records from the 32-partition sf1 convention must NOT be
mixed in (the r13 lesson: cross-config ratios invent inflation).

Usage: build_min_record.py OUT_JSON SF_LABEL IN_JSON [IN_JSON ...]
"""
import json
import sys


def main():
    out, sf = sys.argv[1], sys.argv[2]
    mins = {}
    sources = []
    for path in sys.argv[3:]:
        with open(path) as f:
            rec = json.load(f)
        qs = rec.get("queries", {})
        if not qs:
            continue
        sources.append(path)
        for q, t in qs.items():
            if q not in mins or t < mins[q]:
                mins[q] = t
    # fold an existing floor in (monotone: the record never rises)
    try:
        with open(out) as f:
            for q, t in json.load(f).get("queries", {}).items():
                if q not in mins or t < mins[q]:
                    mins[q] = t
    except FileNotFoundError:
        pass
    body = {"queries": dict(sorted(mins.items())), "sf": sf,
            "config": "local[32], shuffle=200, driver 24g (scale_probe.sh)",
            "sources": sources}
    with open(out, "w") as f:
        json.dump(body, f)
        f.write("\n")
    print(f"[min] {out}: {len(mins)} queries from {len(sources)} records")


if __name__ == "__main__":
    main()
