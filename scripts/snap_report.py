#!/usr/bin/env python3
"""Summarize the BENCH-SNAP instrumentation lines of a bench log
(SPARK_GRAFT_SNAPSHOTS=1): what the shared JVM accumulates between
queries — heap, cumulative GC, live RDD blocks, storage memory, Spark
scratch-dir footprint (shuffle/broadcast files), graft_scratch parquet.

Usage: snap_report.py <bench-log> [topN]

Prints per-query deltas for the topN queries by GC-time delta and the
running maxima, so a debris mechanism (shuffle files never reclaimed,
heap ratchet, GC share climbing late in the pass) is visible as a
trend, not a narrative. Pairs with the per-query wall times in the
final JSON line when present.
"""
import json, sys


def main(path, topn=15):
    snaps, totals = [], None
    for line in open(path):
        if line.startswith("BENCH-SNAP "):
            snaps.append(json.loads(line[11:]))
        elif line.startswith('{"metric"'):
            totals = json.loads(line)
    if not snaps:
        print("no BENCH-SNAP lines found"); return 1
    qt = (totals or {}).get("queries", {})
    rows = []
    prev = None
    for s in snaps:
        d_gc = s["gc_ms"] - (prev["gc_ms"] if prev else 0)
        rows.append((s["q"], qt.get(s["q"]), d_gc, s))
        prev = s
    print(f"{'query':32s} {'wall_s':>8s} {'d_gc_ms':>8s} {'heap_mb':>8s} "
          f"{'shuf_mb':>8s} {'files':>7s} {'rdds':>5s}")
    for q, w, d_gc, s in sorted(rows, key=lambda r: -r[2])[:topn]:
        ws = f"{w:8.1f}" if w is not None else "       -"
        print(f"{q:32s} {ws} {d_gc:8d} {s['heap_mb']:8d} "
              f"{s['tmp_shuffle_mb']:8d} {s['tmp_shuffle_files']:7d} "
              f"{s['rdds']:5d}")
    last = snaps[-1]
    peak_shuf = max(s["tmp_shuffle_mb"] for s in snaps)
    peak_heap = max(s["heap_mb"] for s in snaps)
    print(f"\nqueries snapped: {len(snaps)}  "
          f"total_gc_s: {last['gc_ms'] / 1000:.1f}  gc_count: {last['gc_n']}")
    print(f"peak shuffle-dir: {peak_shuf} MB  final: {last['tmp_shuffle_mb']} MB  "
          f"peak heap: {peak_heap} MB")
    # debris trend: average shuffle-dir size in pass thirds — a ratchet
    # shows as a monotone climb, periodic reclamation as a flat profile
    n = len(snaps)
    for name, seg in [("first", snaps[:n // 3]), ("middle", snaps[n // 3:2 * n // 3]),
                      ("last", snaps[2 * n // 3:])]:
        if seg:
            avg = sum(s["tmp_shuffle_mb"] for s in seg) / len(seg)
            print(f"shuffle-dir avg, {name} third: {avg:.0f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 15))
