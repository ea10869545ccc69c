#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (done by the
caller via sbt), then compare each <out>/<name> parquet against DuckDB
executing oracle_sql.json over the same sf tables.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Comparison: sort columns by name, exact value compare (after row sort for
stability), plus a report of schema and row-count diffs. Stricter than any
plausible driver hash (exact match ⇒ any hash matches).
"""
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # ns-vs-us dtype mismatch breaks equality w/ NaT
        if str(df[c].dtype).startswith("datetime64"):
            s = df[c]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failures += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        # dtype KIND must agree: DuckDB HUGEINT surfaces as float64 while
        # Spark emits int64 — values compare equal but a hash-sensitive
        # driver compare fails (bit r1: q37 session_id). Catch it here.
        bad_kinds = [c for c in g.columns
                     if g[c].dtype.kind != w[c].dtype.kind]
        if bad_kinds:
            print(f"FAIL {name}: dtype kind mismatch "
                  f"{[(c, str(g[c].dtype), str(w[c].dtype)) for c in bad_kinds]}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(g)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            failures += 1
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
