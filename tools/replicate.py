#!/usr/bin/env python3
"""Replicate a testdata scale-factor directory K times for scale probes.

Usage: python3 tools/replicate.py <srcDir> <dstDir> <K>

Every table is concatenated K times; key columns are offset per copy by
(max(key)+1) so entities stay distinct and joins stay consistent across
copies (copy i of orders references copy i of customer, etc.). Content
columns (text, embeddings, timestamps) are left unchanged, which makes the
result a WORST CASE for dedup/similarity operators: every document gains
K-1 exact duplicates, so true near-dup pairs grow ~K(K-1)/2 per original
relation while the corpus grows K times. Tiny dims (nation, region) are
copied once, unchanged.

Builder-side tooling only (python/pyarrow are driver-side deps) — the
shipped library never calls this.
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns; the offset unit is shared per ENTITY so foreign
# keys line up across tables (custkey offset identical in customer+orders)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
ENTITY = {  # key column -> entity name (offset unit shared per entity)
    "c_custkey": "cust", "o_custkey": "cust",
    "o_orderkey": "order", "l_orderkey": "order",
    "l_partkey": "part", "p_partkey": "part",
    "l_suppkey": "supp", "s_suppkey": "supp",
    "doc_id": "doc", "vec_id": "vec",
    "event_id": "evt", "user_id": "user",
}
COPY_ONCE = ["nation", "region"]


def main(src: str, dst: str, k: int) -> None:
    import os
    os.makedirs(dst, exist_ok=True)
    # one offset unit per entity = max over every table referencing it
    unit = {}
    for tbl, keys in KEYS.items():
        t = pq.read_table(f"{src}/{tbl}.parquet", columns=keys)
        for key in keys:
            ent = ENTITY[key]
            m = pc.max(t[key]).as_py() + 1
            unit[ent] = max(unit.get(ent, 0), m)
    for tbl in COPY_ONCE:
        pq.read_table(f"{src}/{tbl}.parquet")  # validate readable
        import shutil
        shutil.copyfile(f"{src}/{tbl}.parquet", f"{dst}/{tbl}.parquet")
    for tbl, keys in KEYS.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        copies = []
        for i in range(k):
            c = t
            for key in keys:
                off = i * unit[ENTITY[key]]
                if off:
                    col = pc.add(c[key], pa.scalar(off, type=c.schema.field(key).type))
                    c = c.set_column(c.schema.get_field_index(key), key, col)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{tbl}.parquet", compression="snappy")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
