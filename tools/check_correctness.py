#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares: column names (sorted), row count, and values (rows sorted,
exact for ints/strings, tiny epsilon report for floats).
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in idx]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return str(a) == str(b)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    import os
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
        except Exception as e:
            results[name] = f"ERROR reading spark output: {e}"
            continue
        if name not in oracle:
            # an empty un-oracled result is a dead operator, not a pass
            results[name] = (f"rows-only: {len(grows)} rows" if grows
                             else "EMPTY rows-only output")
            continue
        try:
            exp = con.execute(oracle[name])
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        g, gc = canon(grows, gcols)
        e_, ec = canon(erows, ecols)
        if gc != ec:
            results[name] = f"COLUMN MISMATCH spark={gc} duckdb={ec}"
            continue
        if len(g) != len(e_):
            results[name] = f"ROWCOUNT MISMATCH spark={len(g)} duckdb={len(e_)}"
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(g, e_)):
            for j, (gv, ev) in enumerate(zip(gr, er)):
                if not eq(gv, ev):
                    bad = (i, gc[j], gv, ev)
                    break
            if bad:
                break
        results[name] = "OK ({} rows)".format(len(g)) if not bad else \
            f"VALUE MISMATCH row#{bad[0]} col={bad[1]} spark={bad[2]!r} duckdb={bad[3]!r}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    ro = sum(1 for v in results.values() if v.startswith("rows-only"))
    for k, v in results.items():
        flag = " " if v.startswith(("OK", "rows-only")) else "!"
        print(f"{flag} {k:24s} {v}")
    print(f"\n{ok} OK, {ro} rows-only, {len(results)-ok-ro} FAILED of {len(results)}")
    sys.exit(0 if ok + ro == len(results) else 1)


if __name__ == "__main__":
    main()
