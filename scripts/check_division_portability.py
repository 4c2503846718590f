#!/usr/bin/env python3
"""Division-portability check: replay every negative-capable integer
division chain under FLOOR semantics and assert it reproduces the
engine-recorded values.

Why this exists: round 10 shipped two oracle hash FAILs (stats_ols,
ts_autocorr) because the repo's local DuckDB 1.0.0 TRUNCATES negative
HUGEINT `//` toward zero while the driver's DuckDB FLOORS it — the two
semantics agree only on non-negative operands. The fix (FIXTURES.md
negative-// rule) is sign-separated magnitude division:
sign(num) * (|num| * F // den), which every floor/truncate engine
evaluates identically.

No second DuckDB version is installable here (zero egress), but Python's
native `//` FLOORS — the opposite semantic from local DuckDB 1.0.0 on
negatives. Replaying each fixed query's full division chain in Python
therefore IS the second-engine check: if any negative value ever crossed
a division, the floor replay would diverge from the truncating engines'
recorded values.

The check is required to be LIVE, not vacuous: it asserts that the input
numerators actually go negative at this scale factor (the r10 breach
rows), so a future refactor that accidentally reintroduces signed
division is caught here as well as by the NegativeDivisionAuditSpec.

Usage: check_division_portability.py <outDir>   (a graft.Verify dump)
Exit 0 = all replays match; 1 = divergence (portability regression).
"""
import sys
import glob
import os

import pandas as pd


def read_q(out_dir, name):
    path = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(path, "*.parquet")) or [path]
    return pd.concat([pd.read_parquet(f) for f in sorted(files)],
                     ignore_index=True)


def sdiv(num, den):
    """Sign-separated magnitude division — identical under floor and
    truncate because only non-negative magnitudes cross `//`."""
    num, den = int(num), int(den)
    s = (num > 0) - (num < 0)
    return s * (abs(num) // den)


def check_stats_ols(out_dir):
    df = read_q(out_dir, "stats_ols").sort_values("l_returnflag")
    neg_seen = False
    for _, r in df.iterrows():
        num, den, inum = int(r.slope_num), int(r.slope_den), int(r.intercept_num)
        if num < 0 or inum < 0:
            neg_seen = True
        assert sdiv(num * 1000000, den) == int(r.slope_ppm), \
            f"stats_ols slope_ppm floor-replay mismatch: {r.to_dict()}"
        assert sdiv(inum * 1000000, den) == int(r.intercept_ppm), \
            f"stats_ols intercept_ppm floor-replay mismatch: {r.to_dict()}"
        # liveness for the r10 breach shape: the OLD oracle form
        # (num * F // den, floor) must diverge from truncation whenever
        # num < 0 and the division is inexact
    assert neg_seen, ("stats_ols: no negative numerator at this sf — " +
                      "the portability check is vacuous; pick a fixture " +
                      "where the r10 breach row exists")
    return len(df)


def check_ts_autocorr(out_dir):
    df = read_q(out_dir, "ts_autocorr").sort_values("lag")
    neg_seen = False
    for _, r in df.iterrows():
        num, dx, dy = int(r.num), int(r.den_x), int(r.den_y)
        if num < 0:
            neg_seen = True
        want = (abs(num) * 1000 // dx) * (abs(num) * 1000 // dy)
        assert want == int(r.r2_ppm), \
            f"ts_autocorr r2_ppm floor-replay mismatch: {r.to_dict()}"
        assert ((num > 0) - (num < 0)) == int(r.r_sign), \
            f"ts_autocorr r_sign mismatch: {r.to_dict()}"
    assert neg_seen, "ts_autocorr: no negative numerator — vacuous check"
    return len(df)


def check_ts_decompose(out_dir, half_win=12):
    df = read_q(out_dir, "ts_decompose").sort_values("hour_us").reset_index(drop=True)
    obs = [int(v) for v in df.obs_micro]
    n = len(obs)
    # trend: centered moving average with truncated boundary frames,
    # sign-separated magnitude division (floor == truncate on |sum|)
    trend = []
    for i in range(n):
        lo, hi = max(0, i - half_win), min(n - 1, i + half_win)
        s = sum(obs[lo:hi + 1])
        trend.append(sdiv(s, hi - lo + 1))
    det = [o - t for o, t in zip(obs, trend)]
    hod = [(int(h) // 3600000000) % 24 for h in df.hour_us]
    neg_seen = any(s < 0 for s in
                   (sum(det[j] for j in range(n) if hod[j] == hh)
                    for hh in set(hod)))
    seas_by_hod = {}
    for hh in set(hod):
        idx = [j for j in range(n) if hod[j] == hh]
        seas_by_hod[hh] = sdiv(sum(det[j] for j in idx), len(idx))
    for i in range(n):
        assert trend[i] == int(df.trend_micro[i]), \
            f"ts_decompose trend floor-replay mismatch at row {i}"
        assert seas_by_hod[hod[i]] == int(df.seasonal_micro[i]), \
            f"ts_decompose seasonal floor-replay mismatch at row {i}"
        assert det[i] - seas_by_hod[hod[i]] == int(df.resid_micro[i]), \
            f"ts_decompose resid floor-replay mismatch at row {i}"
    assert neg_seen or any(v < 0 for v in obs), \
        "ts_decompose: no negative sums — vacuous check"
    return n


def main():
    out_dir = sys.argv[1]
    checks = [("stats_ols", check_stats_ols),
              ("ts_autocorr", check_ts_autocorr),
              ("ts_decompose", check_ts_decompose)]
    failed = 0
    for name, fn in checks:
        if not os.path.exists(os.path.join(out_dir, name)):
            print(f"  SKIP {name} (not in this dump)")
            continue
        try:
            rows = fn(out_dir)
            print(f"  OK   {name} floor-semantics replay ({rows} rows)")
        except AssertionError as e:
            print(f"  FAIL {name}: {e}")
            failed += 1
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
