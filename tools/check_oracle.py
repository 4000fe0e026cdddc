#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the parquet results Verify.scala wrote to OUT_DIR, runs each
oracle_sql.json query in DuckDB over the same sf directory, and compares
row count, column names/dtypes, and exact values after sorting columns by
name and rows by all columns. Stricter than any reasonable hash compare.

Usage: check_oracle.py OUT_DIR SF_DIR [query ...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def tz_schema(df: pd.DataFrame):
    """(column, tz-aware?) for every datetime column — the driver gate
    treats tz-aware (Spark TIMESTAMP_LTZ) vs naive (NTZ / DuckDB) as a
    schema mismatch, so we must too rather than normalize it away."""
    return [(c, getattr(df[c].dt, "tz", None) is not None)
            for c in df.columns if str(df[c].dtype).startswith("datetime64")]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps → us for uniform value compare (tz checked separately)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dt, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        tzg, tzw = tz_schema(got.reindex(sorted(got.columns), axis=1)), \
            tz_schema(want.reindex(sorted(want.columns), axis=1))
        if tzg != tzw:
            print(f"FAIL {name}: tz schema {tzg} != {tzw} "
                  "(LTZ-vs-NTZ — driver gate fails this)")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:500]}")
            n_fail += 1
            continue
        # dtype report (informational — drift here may still hash-match)
        dt = [(c, str(g[c].dtype), str(w[c].dtype))
              for c in g.columns if str(g[c].dtype) != str(w[c].dtype)]
        note = f"  dtype drift: {dt}" if dt else ""
        print(f"PASS {name} ({len(g)} rows){note}")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
