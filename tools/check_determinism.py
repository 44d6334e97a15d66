#!/usr/bin/env python3
"""Run-to-run determinism gate for every rows-only query.

Usage: python3 tools/check_determinism.py <verify_out_dir_A> <verify_out_dir_B>

Oracle-checked queries are already pinned by the DuckDB compare; the
rows-only ones (no oracle entry in oracle_sql.json) have no external
anchor, so their gate is exact equality between two independent Verify
runs. A query that differs between runs is nondeterministic and FAILS —
nondeterminism would also make the driver's rows-only record meaningless.
"""
import json, os, sys
import duckdb

from check_correctness import normalize, rendered


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{a_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(a_dir) if os.path.isdir(f"{a_dir}/{d}"))
    rows_only = [n for n in names if n not in oracle]
    con = duckdb.connect()
    failed = 0
    for name in rows_only:
        if not os.path.isdir(f"{b_dir}/{name}"):
            print(f"! {name:24s} MISSING in second run")
            failed += 1
            continue
        try:
            a = normalize(con.execute(f"SELECT * FROM '{a_dir}/{name}/*.parquet'").df())
            b = normalize(con.execute(f"SELECT * FROM '{b_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"! {name:24s} ERROR reading/sorting: {e!r}")
            failed += 1
            continue
        if list(a.columns) != list(b.columns) or len(a) != len(b) \
                or rendered(a) != rendered(b):
            print(f"! {name:24s} NONDETERMINISTIC "
                  f"(A: {len(a)} rows, B: {len(b)} rows)")
            failed += 1
        else:
            print(f"  {name:24s} deterministic ({len(a)} rows)")
    print(f"\n{len(rows_only) - failed} deterministic, {failed} FAILED "
          f"of {len(rows_only)} rows-only queries")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
