#!/usr/bin/env python3
"""Local emulation of the driver's t2 gate: for each query parquet dumped by
graft.Verify, run the matching oracle SQL in DuckDB against the same sf dir
and compare (columns sorted by name, rows sorted, exact values).

Usage: compare_oracle.py <sfDir> <verifyOutDir> [--json <path>]

With --json, also writes a machine-readable per-query record in the
driver's CORRECTNESS_r*.json schema:
  {name: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
          err}}
Queries dumped by Verify but absent from oracle_sql.json (the declared
rows-only contracts) are recorded with hash_match/oracle_rows null and
rows_match = (spark_rows > 0), mirroring the driver's weaker check.
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, json_path=None):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (e.g. ScaleUp output) are parquet DIRECTORIES
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # queries that crashed before dumping (graft.Verify writes the actual
    # exception per query) — these MUST surface as err entries; the r7
    # driver artifact silently omitted six crashed queries
    errors_path = f"{out_dir}/errors.json"
    dump_errors = (json.load(open(errors_path))
                   if os.path.exists(errors_path) else {})
    record = {}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "err": None}
        try:
            if name in dump_errors:
                raise RuntimeError(f"spark dump failed: {dump_errors[name]}")
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            want = con.sql(sql).fetchdf()
            rec["spark_rows"], rec["oracle_rows"] = len(got), len(want)
            got = got[sorted(got.columns)]
            want = want[sorted(want.columns)]
            status, detail = compare(got, want)
            rec["schema_match"] = list(got.columns) == list(want.columns)
            rec["rows_match"] = len(got) == len(want)
            rec["hash_match"] = status == "OK"
            if status != "OK":
                rec["err"] = detail
        except Exception as e:
            status, detail = "ERROR", str(e).split("\n")[0][:200]
            rec["err"] = detail
        record[name] = rec
        if status == "OK":
            n_pass += 1
            print(f"  OK   {name} ({detail})")
        else:
            n_fail += 1
            print(f"  FAIL {name}: {detail}")
    # rows-only queries: dumped by Verify, no oracle declared. Include
    # crashed-before-dump names too (no dir exists, but errors.json has
    # the exception) so a rows-only crash can't vanish from the record.
    rows_only_names = sorted(
        set(n for n in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{n}"))
        | (set(dump_errors) - set(oracle)))
    for name in rows_only_names:
        if name in record:
            continue
        rec = {"rows_match": False, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "rows_only": True}
        try:
            if name in dump_errors:
                raise RuntimeError(f"spark dump failed: {dump_errors[name]}")
            n = con.sql(
                f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
            ).fetchone()[0]
            rec["spark_rows"], rec["rows_match"] = n, n > 0
        except Exception as e:
            rec["err"] = str(e).split("\n")[0][:200]
        record[name] = rec
        print(f"  {'ROWS' if rec['rows_match'] else 'FAIL'} {name} "
              f"(rows-only: {rec['spark_rows']} rows)")
        if not rec["rows_match"]:
            n_fail += 1
    print(f"{n_pass} pass / {n_fail} fail")
    if json_path:
        with open(json_path, "w") as f:
            json.dump(dict(sorted(record.items())), f, indent=2)
            f.write("\n")
        print(f"wrote {json_path} ({len(record)} queries)")
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
    argv = sys.argv[1:]
    jp = None
    if "--json" in argv:
        i = argv.index("--json")
        jp = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sys.exit(main(argv[0], argv[1], jp))
