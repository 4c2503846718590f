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

The check wants to be LIVE, not vacuous: it verifies that the input
numerators actually go negative at this scale factor (the r10 breach
rows), so a future refactor that accidentally reintroduces signed
division is caught here as well as by the NegativeDivisionAuditSpec.
A fixture where no numerator goes negative is reported as WARN
(vacuous), distinct from FAIL — vacuousness is a coverage gap, not a
divergence, and must not abort verify_local.sh (ADVICE r11).

SCOPE LIMIT (r11 lesson): this script models DIVISION SEMANTICS only.
Round 11 proved value SERIALIZATION is a separate cross-engine failure
channel — the driver's hasher canonicalizes DECIMAL(38,0) values
differently even when every division agrees (the 4/4-vs-0/187
DECIMAL-output correlation). That class is invisible here by
construction and is covered by the static hashed-output typing gate
(OracleAudit.auditHashedTypes + decimalFields; FIXTURES.md typing
rule).

Usage: check_division_portability.py <outDir>   (a graft.Verify dump)
Exit 0 = all replays match (WARN-vacuous allowed); 1 = divergence
(portability regression).
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


class VacuousCheck(Exception):
    """The replay matched but no negative numerator exists at this sf —
    the negative-division coverage is vacuous (WARN, not FAIL)."""


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
    if not neg_seen:
        raise VacuousCheck("stats_ols: no negative numerator at this sf — "
                           "the negative-// coverage is vacuous here")
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
    if not neg_seen:
        raise VacuousCheck("ts_autocorr: no negative numerator — vacuous")
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
    if not (neg_seen or any(v < 0 for v in obs)):
        raise VacuousCheck("ts_decompose: no negative sums — vacuous")
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
        except VacuousCheck as e:
            # coverage gap, not a divergence — report, don't abort
            print(f"  WARN {name}: {e}")
        except (AssertionError, ZeroDivisionError) as e:
            # a zero denominator is a real replay divergence (the engine
            # recorded a value this chain cannot reproduce), not a crash
            print(f"  FAIL {name}: {type(e).__name__}: {e}")
            failed += 1
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
