#!/bin/bash
# Local t2 emulation: dump query results at sf0.01 + compare vs DuckDB.
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
cd /root/repo
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | grep -vE "^\[info\]" | grep -vE "WARN|INFO" | head -20
python3 scripts/compare_oracle.py "$SF" "$OUT"
