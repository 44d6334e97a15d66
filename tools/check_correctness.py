#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the sf_dir tables, and
compares THE WAY THE DRIVER DOES: both sides go through pandas
(`.df()`), columns are sorted by name, rows are `sort_values`-sorted
over ALL columns, and cells are compared by their pandas-scalar str()
rendering — sensitive to int-vs-float materialization ('5' != '5.0')
while tolerating same-rendered widths (int32 5 == int64 5, matching
the observed driver behavior). This intentionally reproduces the two
driver failure modes the round-1 fetchall()/float() version hid:
  * DuckDB HUGEINT sums materialize as float64 in pandas and hash-fail
    against Spark's int64 even when values are equal;
  * a top-level array column makes pandas sort_values throw
    "unhashable type: numpy.ndarray" — same for rows-only outputs.
"""
import json, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    """Driver-style canonical form: columns sorted by name, rows sorted
    by all columns. Raises on unsortable (array) cells — that is signal,
    not noise."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def render(v):
    """Driver-style cell rendering: str() of the pandas scalar. int32(5)
    and int64(5) both render '5'; float64(5.0) renders '5.0' — exactly
    the int-vs-HUGEINT sensitivity the driver's hash shows."""
    try:
        if pd.isna(v):
            return "<NA>"
    except (TypeError, ValueError):
        pass  # arrays reach here; normalize() already rejects them
    return str(v)


def rendered(df):
    return [[render(df.at[i, c]) for c in df.columns] for i in range(len(df))]


def first_diff(g, e, gr, er):
    """Locate the first differing rendered cell (for the report only)."""
    for i in range(len(gr)):
        for j, c in enumerate(g.columns):
            if gr[i][j] != er[i][j]:
                return (f"VALUE row#{i} col={c} spark={gr[i][j]!r} "
                        f"({g.dtypes.iloc[j]}) duckdb={er[i][j]!r} "
                        f"({e.dtypes.iloc[j]})")
    return "no cell diff found (ordering/index?)"


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    # optional third arg: write a per-query JSON self-record (the
    # driver-independent artifact rounds 5 and 7 lacked when the
    # driver-side CORRECTNESS file came back empty)
    json_out = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    record = {}  # name -> {status, rows, schema_hash, row_hash, seconds}
    import hashlib
    import os

    def rec(name, status, df=None):
        entry = {"status": status}
        if df is not None:
            entry["rows"] = int(len(df))
            entry["schema_hash"] = hashlib.sha256(
                repr([(c, str(df.dtypes[c])) for c in df.columns])
                .encode()).hexdigest()[:16]
            entry["row_hash"] = hashlib.sha256(
                repr(rendered(df)).encode()).hexdigest()[:16]
        record[name] = entry

    try:
        vlog = json.load(open(f"{out_dir}/verify_log.json"))
    except Exception:
        vlog = {}
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        try:
            got = normalize(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            results[name] = f"ERROR reading/sorting spark output: {e!r}"
            rec(name, "READ_ERROR")
            continue
        if name not in oracle:
            # an empty un-oracled result is a dead operator, not a pass
            results[name] = (f"rows-only: {len(got)} rows" if len(got)
                             else "EMPTY rows-only output")
            rec(name, "rows-only" if len(got) else "EMPTY", got)
            continue
        try:
            exp = normalize(con.execute(oracle[name]).df())
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e!r}"
            rec(name, "ORACLE_ERROR", got)
            continue
        if list(got.columns) != list(exp.columns):
            results[name] = (f"COLUMN MISMATCH spark={list(got.columns)}"
                             f" duckdb={list(exp.columns)}")
            rec(name, "COLUMN_MISMATCH", got)
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT MISMATCH spark={len(got)} duckdb={len(exp)}"
            rec(name, "ROWCOUNT_MISMATCH", got)
            continue
        gr, er = rendered(got), rendered(exp)
        if gr == er:
            results[name] = f"OK ({len(got)} rows)"
            rec(name, "OK", got)
        else:
            results[name] = f"MISMATCH: {first_diff(got, exp, gr, er)}"
            rec(name, "VALUE_MISMATCH", got)
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    ro = sum(1 for v in results.values() if v.startswith("rows-only"))
    summary = (f"{ok} OK, {ro} rows-only, "
               f"{len(results)-ok-ro} FAILED of {len(results)}")
    # summary FIRST and LAST on stdout (the Bench lesson applied to the
    # correctness path — partial stream loss cannot hide the verdict)
    print(f"[correctness-summary] {summary}")
    for k, v in results.items():
        flag = " " if v.startswith(("OK", "rows-only")) else "!"
        print(f"{flag} {k:24s} {v}")
    print(f"\n{summary}")
    if json_out:
        for name, entry in record.items():
            sec = vlog.get(name, {}).get("seconds")
            if sec is not None:
                entry["seconds"] = sec
        # queries Verify failed to dump never produce an output dir —
        # record them too, or a crash would just shrink the file
        for name, v in vlog.items():
            if name not in record and not v.get("ok", True):
                record[name] = {"status": "VERIFY_FAILED",
                                "error": v.get("error"),
                                "seconds": v.get("seconds")}
        with open(json_out, "w") as f:
            json.dump({"summary": summary, "n_ok": ok, "n_rows_only": ro,
                       "n_failed": len(results) - ok - ro,
                       "n_total": len(results),
                       "queries": dict(sorted(record.items()))}, f, indent=1)
        print(f"self-record written: {json_out}")
        # ALSO emit the driver's exact per-query schema (round-8 verdict
        # #1a): {"<q>": {"rows_match":, "schema_match":, "hash_match":}}
        # so any format mismatch between the self-record and the driver
        # artifact is directly visible, and a future empty driver file
        # can be diffed against a same-schema non-empty one.
        drv = {}
        for name, v in results.items():
            if v.startswith("OK"):
                drv[name] = {"rows_match": True, "schema_match": True,
                             "hash_match": True}
            elif v.startswith("rows-only"):
                drv[name] = {"rows_match": True}
            elif v.startswith("ROWCOUNT"):
                drv[name] = {"rows_match": False, "schema_match": True,
                             "hash_match": False}
            elif v.startswith("COLUMN"):
                drv[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False}
            else:
                drv[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "error": v}
        drv_out = json_out.replace(".json", "") + ".driverfmt.json"
        with open(drv_out, "w") as f:
            json.dump(dict(sorted(drv.items())), f, indent=1)
        print(f"driver-format record written: {drv_out}")
    sys.exit(0 if ok + ro == len(results) else 1)


if __name__ == "__main__":
    main()
