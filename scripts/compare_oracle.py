#!/usr/bin/env python3
"""Local emulation of the driver's t2 gate: for each query parquet dumped by
graft.Verify, run the matching oracle SQL in DuckDB against the same sf dir
and compare (columns sorted by name, rows sorted, exact values).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (e.g. ScaleUp output) are parquet DIRECTORIES
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.sql(sql).fetchdf()
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            status, detail = compare(got, want)
        except Exception as e:
            status, detail = "ERROR", str(e).split("\n")[0][:200]
        if status == "OK":
            n_pass += 1
            print(f"  OK   {name} ({detail})")
        else:
            n_fail += 1
            print(f"  FAIL {name}: {detail}")
    print(f"{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


def compare(got, want):
    if list(got.columns) != list(want.columns):
        return "FAIL", f"columns {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return "FAIL", f"rows {len(got)} vs {len(want)}"
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    for c in gs.columns:
        gv, wv = gs[c].tolist(), ws[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                return "FAIL", (f"col {c} row {i}: {a!r} != {b!r} "
                                f"(diff {abs(a-b):.3e})")
            return "FAIL", f"col {c} row {i}: {a!r} != {b!r}"
    return "OK", f"{len(got)} rows x {len(got.columns)} cols"


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
