#!/usr/bin/env python3
"""Scale-mode oracle runner: check.py semantics with an ITERATIVELY
MATERIALIZED oracle evaluation, for corpora where DuckDB cannot finish the
one-shot query (recursive-closure CTEs over mutation-inflated pair mass,
unrolled graph rounds, giant posting CTEs).

Instead of handing DuckDB one query, each oracle's WITH-chain is split into
its top-level CTEs and each one is materialized as a TEMP TABLE in order —
every round of an unrolled graph CTE runs once against a materialized
predecessor (linear work, spillable) instead of being re-inlined, and the
canonical transitive-closure pair

    reach AS (SELECT id, id AS r FROM verts
      UNION SELECT u.a AS id, reach.r FROM und u JOIN reach ON u.b = reach.id),
    lbl AS (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id)

is replaced by min-label propagation to fixpoint over materialized `und`
(O(edges * diameter) instead of the O(component^2) reachability set the
recursive CTE enumerates). Label propagation converges to MIN(reachable id)
per vertex — identical to lbl by symmetry of undirected reachability — so
this stays a ground-truth closure, just evaluated with bounded memory.

Any OTHER recursive CTE falls back to one-shot materialization
(CREATE TEMP TABLE x AS WITH RECURSIVE ...), so non-closure shapes keep
their exact semantics.

Results print as `PASS <q>` / `FAIL <q>` exactly like check.py, so
tools/sweep_oracle.sh can use this as its timeout fallback. Builder-side
tooling only (python/duckdb/pandas are driver-side deps).

Usage: python3 tools/scale_check.py [sfDir] [outDir]  (env GRAFT_ONLY=regex)
"""
import glob
import json
import os
import re
import sys

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

REACH_RE = re.compile(
    r"^SELECT id, id AS r FROM verts\s+UNION\s+"
    r"SELECT u\.a AS id, reach\.r FROM und u JOIN reach ON u\.b = reach\.id$",
    re.S,
)
LBL_BODY = "SELECT id, MIN(r) AS lbl FROM reach GROUP BY id"


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def split_ctes(sql: str):
    """Split `WITH [RECURSIVE] a AS (...), b AS (...) <tail>` into
    ([(name, body)...], tail). Plain statements return ([], sql)."""
    s = sql.strip()
    m = re.match(r"WITH\s+(RECURSIVE\s+)?", s, re.I)
    if not m:
        return [], s
    i = m.end()
    ctes = []
    while True:
        m = re.match(
            r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(\([^)]*\))?\s*AS\s*"
            r"(?:NOT\s+MATERIALIZED\s*|MATERIALIZED\s*)?\(",
            s[i:], re.I)
        if not m:
            raise ValueError(f"CTE parse failed at: {s[i:i+80]!r}")
        name = m.group(1)
        collist = m.group(2) or ""
        j = i + m.end()  # first char inside the paren
        depth, q = 1, None
        k = j
        while k < len(s) and depth:
            ch = s[k]
            if q:
                if ch == q:
                    q = None
            elif ch in ("'", '"'):
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            k += 1
        ctes.append((name, collist, s[j : k - 1].strip()))
        # after the closing paren: either `,` (next cte) or the tail
        m2 = re.match(r"\s*,", s[k:])
        if m2:
            i = k + m2.end()
        else:
            return ctes, s[k:].strip()


def components_iterative(con, und="und", verts="verts"):
    """Min-label propagation to fixpoint over materialized und/verts;
    leaves the result as temp table `lbl`(id, lbl)."""
    con.execute(f"CREATE OR REPLACE TEMP TABLE lbl AS SELECT id, id AS lbl FROM {verts}")
    while True:
        con.execute(
            f"""CREATE OR REPLACE TEMP TABLE lbl_next AS
            SELECT v.id, LEAST(v.lbl, COALESCE(m.ml, v.lbl)) AS lbl
            FROM lbl v LEFT JOIN (
              SELECT u.a AS id, MIN(l.lbl) AS ml
              FROM {und} u JOIN lbl l ON u.b = l.id GROUP BY u.a) m
            ON v.id = m.id"""
        )
        changed = con.sql(
            "SELECT COUNT(*) FROM lbl_next n JOIN lbl o ON n.id = o.id "
            "AND n.lbl <> o.lbl"
        ).fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE lbl AS SELECT * FROM lbl_next")
        con.execute("DROP TABLE lbl_next")
        if changed == 0:
            return


def run_materialized(con, sql: str) -> pd.DataFrame:
    ctes, tail = split_ctes(sql)
    created = []
    try:
        i = 0
        while i < len(ctes):
            name, collist, body = ctes[i]
            nxt = ctes[i + 1] if i + 1 < len(ctes) else (None, None, None)
            if (
                name == "reach"
                and REACH_RE.match(body)
                and nxt[0] == "lbl"
                and nxt[2] == LBL_BODY
            ):
                # canonical closure pair -> iterative components
                components_iterative(con)
                created.append("lbl")
                i += 2
                continue
            if collist or re.search(rf"\b{name}\b", body):
                # column-listed or self-referential (recursive) CTE: one-shot
                con.execute(
                    f"CREATE OR REPLACE TEMP TABLE {name} AS "
                    f"WITH RECURSIVE {name}{collist} AS ({body}) SELECT * FROM {name}"
                )
            else:
                con.execute(f"CREATE OR REPLACE TEMP TABLE {name} AS {body}")
            created.append(name)
            i += 1
        return con.sql(tail).df()
    finally:
        for name in reversed(created):
            try:
                con.execute(f"DROP TABLE IF EXISTS {name}")
            except Exception:
                pass


def main():
    con = duckdb.connect()
    tmp = os.environ.get("GRAFT_DUCK_TMP", "/tmp/duckspill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    mem = os.environ.get("GRAFT_DUCK_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        name = os.path.basename(f)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

    with open(f"{OUT_DIR}/oracle_sql.json") as fh:
        oracles = json.load(fh)

    only = os.environ.get("GRAFT_ONLY")
    if only:
        pat = re.compile(only)
        oracles = {k: v for k, v in oracles.items() if pat.search(k)}

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = norm(run_materialized(con, sql))
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
            print(f"PASS {name} ({len(want)} rows)", flush=True)
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:4])}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
