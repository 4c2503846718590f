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
sf10 that is the multi-file-fixture records from r16 on (the r15
single-file-layout floors were archived when ScaleUp moved to the
multi-file layout; before that, r10 introduced the 24g heap and 200
partitions held since r8). Records from the 32-partition sf1
convention must NOT be mixed in (the r13 lesson: cross-config ratios
invent inflation).

Cold/warm cache provenance (VERDICT r15 task 1): input records may
carry a "cache" map ({query: "cold"|"warm"}) tagging what each
recorded time measured. The floor keeps the provenance of whichever
record supplied each query's min, so a floor row always says whether
it is a cold build or an amortized warm read.

Usage: build_min_record.py OUT_JSON SF_LABEL IN_JSON [IN_JSON ...]
         [--config CONFIG_STRING]
SF_LABEL should be a canonical label (sf10), not a directory path.
"""
import json
import sys


def main():
    argv = list(sys.argv[1:])
    config = "local[32], shuffle=200, driver 24g (scale_probe.sh)"
    if "--config" in argv:
        i = argv.index("--config")
        config = argv[i + 1]
        del argv[i:i + 2]
    out, sf = argv[0], argv[1]
    mins = {}
    prov = {}
    sources = []
    for path in argv[2:]:
        with open(path) as f:
            rec = json.load(f)
        qs = rec.get("queries", {})
        if not qs:
            continue
        sources.append(path)
        cache = rec.get("cache", {})
        for q, t in qs.items():
            if q not in mins or t < mins[q]:
                mins[q] = t
                if q in cache:
                    prov[q] = cache[q]
                else:
                    prov.pop(q, None)
    # fold an existing floor in (monotone: the record never rises)
    try:
        with open(out) as f:
            old = json.load(f)
        old_cache = old.get("cache", {})
        for q, t in old.get("queries", {}).items():
            if q not in mins or t < mins[q]:
                mins[q] = t
                if q in old_cache:
                    prov[q] = old_cache[q]
                else:
                    prov.pop(q, None)
    except FileNotFoundError:
        pass
    body = {"queries": dict(sorted(mins.items())),
            "cache": dict(sorted(prov.items())), "sf": sf,
            "config": config, "sources": sources}
    with open(out, "w") as f:
        json.dump(body, f)
        f.write("\n")
    print(f"[min] {out}: {len(mins)} queries from {len(sources)} records")


if __name__ == "__main__":
    main()
