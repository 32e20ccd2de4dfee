#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Runs DuckDB on oracle_sql.json (tables = parquet files in sfDir), reads the
engine's parquet dumps from outDir, sorts columns by name + rows, and
compares values exactly. Reports per-query PASS/FAIL with first diffs.

This is builder-side tooling only (python/duckdb are driver-side deps).
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, strip tz
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            # Integer WIDTH doesn't affect the driver hash (int32 vs int64
            # render identically) — widen to int64. But int vs float DOES
            # (DuckDB HUGEINT -> float64 renders "1.0" vs Spark "1"), so no
            # float coercion: dtype kind is compared strictly below.
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    con = duckdb.connect()
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

    with open(f"{OUT_DIR}/oracle_sql.json") as fh:
        oracles = json.load(fh)

    # GRAFT_ONLY: optional regex — check only matching queries (pairs with
    # Verify's SPARK_GRAFT_ONLY partial dumps; avoids running all ~160
    # oracle SQLs when iterating on one query).
    only = os.environ.get("GRAFT_ONLY")
    if only:
        import re

        pat = re.compile(only)
        oracles = {k: v for k, v in oracles.items() if pat.search(k)}
        print(f"[check] GRAFT_ONLY={only}: {len(oracles)} queries selected")

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got_files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
            got = norm(
                pd.concat([pd.read_parquet(p) for p in got_files], ignore_index=True)
            )
        except Exception as e:
            print(f"FAIL {name}: engine output missing/unreadable: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(want, got, check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(want)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:4])}")
            # show first mismatching rows
            neq = (want != got) & ~(want.isna() & got.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"  first diff row {i}:\n  want: {want.loc[i].to_dict()}\n  got:  {got.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
