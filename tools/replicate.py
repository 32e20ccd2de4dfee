#!/usr/bin/env python3
"""Replicate a testdata scale-factor directory K times for scale probes.

Usage: python3 tools/replicate.py <srcDir> <dstDir> <K> [--mutate=FRAC]

Every table is concatenated K times; key columns are offset per copy by
(max(key)+1) so entities stay distinct and joins stay consistent across
copies (copy i of orders references copy i of customer, etc.). Content
columns (text, embeddings, timestamps) are left unchanged, which makes the
result a WORST CASE for dedup/similarity operators: every document gains
K-1 exact duplicates, so true near-dup pairs grow ~K(K-1)/2 per original
relation while the corpus grows K times. Tiny dims (nation, region) are
copied once, unchanged.

--mutate=FRAC (e.g. 0.1) closes the vocab-growth blind spot the verbatim
mode has: in copy i >= 1, FRAC of the pure-alpha whitespace tokens of each
document are salted with a copy-unique lowercase suffix ('q' + base26(i)),
decided by a deterministic splitmix of (doc_id, position, copy) so reruns
produce byte-identical corpora. New token TYPES (and the bigram types
around them) then grow ~linearly with K — a super-Heaps WORST CASE for the
vocabulary-bound families (bigram perplexity, BPE train/apply, vocab
coverage, distinctive terms, novelty), which the verbatim mode holds flat
by construction. n_chars is recomputed from the mutated text.

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

MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — deterministic, well-distributed."""
    x = (x + 0x9E3779B97F4A7C15) & MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
    return x ^ (x >> 31)


def _b26(i: int) -> str:
    s = ""
    while True:
        s = chr(ord('a') + i % 26) + s
        i //= 26
        if i == 0:
            return s


def mutate_docs(table, copy_idx: int, frac: float):
    """Salt FRAC of each doc's pure-alpha tokens with a copy-unique suffix."""
    import pyarrow as pa
    if copy_idx == 0 or frac <= 0:
        return table
    thresh = int(frac * (1 << 32))
    suffix = "q" + _b26(copy_idx)
    doc_ids = table["doc_id"].to_pylist()
    texts = table["text"].to_pylist()
    out = []
    for d, txt in zip(doc_ids, texts):
        base = _mix(d * 0x100000001B3 + copy_idx)
        toks = txt.split(" ")
        for j, tok in enumerate(toks):
            if tok.isalpha() and (_mix(base + j) >> 32) < thresh:
                toks[j] = tok + suffix
        out.append(" ".join(toks))
    t = table.set_column(table.schema.get_field_index("text"), "text",
                         pa.array(out, type=pa.string()))
    ncs = pa.array([len(x) for x in out], type=pa.int64())
    return t.set_column(t.schema.get_field_index("n_chars"), "n_chars", ncs)


def main(src: str, dst: str, k: int, mutate: float = 0.0) -> None:
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
            if tbl == "documents" and mutate > 0:
                c = mutate_docs(c, i, mutate)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dst}/{tbl}.parquet", compression="snappy")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    frac = 0.0
    for a in sys.argv[4:]:
        if a.startswith("--mutate="):
            frac = float(a.split("=", 1)[1])
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]), frac)
