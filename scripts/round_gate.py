#!/usr/bin/env python3
"""Round health gate: cross-check the repo-owned correctness record against
the bench record before calling a round done.

An all-entries-pass correctness file is NOT sufficient: in round 7 the six
crashed queries were simply absent from the driver's record, so it read
all-green while 6/133 queries were broken. This gate fails when:
  1. any correctness entry carries an error or a failed match;
  2. the bench record lists failed queries;
  3. a query name appears in one record but not the other (coverage drift
     between the two gates — the exact shape of the r7 blind spot).

Usage: round_gate.py [--correctness CORRECTNESS_LOCAL.json]
                     [--bench BENCH_LAST_sf0.1.json]
Exit 0 = healthy, 1 = problems (each printed).
"""
import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--correctness", default="/root/repo/CORRECTNESS_LOCAL.json")
    ap.add_argument("--bench", default="/root/repo/BENCH_LAST_sf0.1.json")
    args = ap.parse_args()

    problems = []
    corr = json.load(open(args.correctness))
    if not corr:
        problems.append(f"{args.correctness} is EMPTY — the r6 driver-artifact "
                        "failure mode; rerun scripts/verify_local.sh")
    for name, rec in sorted(corr.items()):
        if rec.get("err"):
            problems.append(f"correctness: {name} errored: {rec['err']}")
        elif rec.get("rows_only"):
            if not rec.get("rows_match"):
                problems.append(f"correctness: rows-only {name} returned 0 rows")
        elif not (rec.get("rows_match") and rec.get("schema_match")
                  and rec.get("hash_match")):
            problems.append(f"correctness: {name} mismatch vs oracle: {rec}")

    bench = json.load(open(args.bench))
    failed = bench.get("failed", [])
    if failed:
        problems.append(f"bench: {len(failed)} queries crashed: {failed}")
    skipped = bench.get("skipped_dead_context", [])
    if skipped:
        problems.append(f"bench: SparkContext died mid-run; {len(skipped)} "
                        f"queries never attempted: {skipped}")

    bench_q = set(bench.get("queries", {})) | set(failed)
    corr_q = set(corr)
    for q in sorted(bench_q - corr_q):
        problems.append(f"coverage: '{q}' benched but absent from the "
                        "correctness record")
    for q in sorted(corr_q - bench_q):
        problems.append(f"coverage: '{q}' verified but absent from the "
                        "bench record")

    if problems:
        for p in problems:
            print(f"GATE FAIL  {p}")
        print(f"{len(problems)} problem(s)")
        return 1
    print(f"round gate OK: {len(corr_q)} queries verified, "
          f"{len(bench_q)} benched, 0 failures, records agree")
    return 0


if __name__ == "__main__":
    sys.exit(main())
