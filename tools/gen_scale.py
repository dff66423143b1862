#!/usr/bin/env python
"""Scale-up replica generator for the scaling-trend measurement.

Replicates the sf0.1 testdata K-fold with shifted keys so the engine can be
timed at ~sf1 without driver-generated data at that scale. Perturbations keep
the workload shape HONEST at 10x:
 - documents: per-copy vowel substitution rewrites tokens, so near-dup pairs
   stay within a copy (the inverted-index/postings cost scales linearly with
   data, not quadratically with copy count);
 - embeddings: per-copy dimension roll (a permutation) keeps within-copy
   cosine structure exactly while decorrelating copies;
 - fact tables: key shifts keep joins consistent per copy.
Schema (incl. timestamp[ns]) is preserved via pyarrow.
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/scale-sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# optional 4th arg: comma-separated table subset (e.g. "documents" for the
# sf25 documents-only spot-check) — default all
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

os.makedirs(DST, exist_ok=True)
VOWELS = "aeiou"


def shift_col(table, name, delta):
    i = table.schema.get_field_index(name)
    col = pa.compute.add(table.column(name), delta)
    return table.set_column(i, table.schema.field(i), col)


def replicate(name, mutate):
    if ONLY is not None and name not in ONLY:
        return
    # one FILE PER COPY under a dataset directory (the layout a real
    # ingest produces — single giant files serialize the scan), with
    # bounded row groups so byte-range splits stay fine-grained
    t = pq.read_table(f"{SRC}/{name}.parquet")
    d = f"{DST}/{name}.parquet"
    os.makedirs(d, exist_ok=True)
    n = 0
    for i in range(K):
        part = mutate(t, i)
        n += part.num_rows
        pq.write_table(part, f"{d}/part-{i:03d}.parquet", row_group_size=131072)
    print(f"{name}: {t.num_rows} -> {n} in {K} files")


def events_copy(t, i):
    if i == 0:
        return t
    t = shift_col(t, "event_id", i * 10**12)
    t = shift_col(t, "user_id", i * 10**4)
    return t


def documents_copy(t, i):
    if i == 0:
        return t
    t = shift_col(t, "doc_id", i * 10**9)
    # rewrite tokens per copy: substitute each vowel with a copy-tagged
    # consonant cluster; within-copy similarity is preserved (the same
    # substitution applies to every doc of the copy)
    texts = t.column("text").to_pylist()
    sub = {v: f"{chr(ord('k') + (i % 5))}{i}" for v in VOWELS}
    def rw(s):
        if s is None:
            return None
        for v, r in sub.items():
            s = s.replace(v, r)
        return s
    idx = t.schema.get_field_index("text")
    return t.set_column(idx, t.schema.field(idx), pa.array([rw(s) for s in texts]))


def embeddings_copy(t, i):
    if i == 0:
        return t
    t = shift_col(t, "vec_id", i * 10**9)
    emb = t.column("embedding").to_pylist()
    arr = np.array(emb, dtype=np.float32)
    rolled = np.roll(arr, i * 7, axis=1)
    idx = t.schema.get_field_index("embedding")
    typ = t.schema.field(idx).type
    return t.set_column(idx, t.schema.field(idx),
                        pa.array([row for row in rolled.tolist()], type=typ))


def lineitem_copy(t, i):
    if i == 0:
        return t
    t = shift_col(t, "l_orderkey", i * 10**9)
    t = shift_col(t, "l_suppkey", i * 10**6)
    return t


def orders_copy(t, i):
    if i == 0:
        return t
    t = shift_col(t, "o_orderkey", i * 10**9)
    t = shift_col(t, "o_custkey", i * 10**7)
    return t


def customer_copy(t, i):
    if i == 0:
        return t
    return shift_col(t, "c_custkey", i * 10**7)


replicate("events", events_copy)
replicate("documents", documents_copy)
replicate("embeddings", embeddings_copy)
replicate("lineitem", lineitem_copy)
replicate("orders", orders_copy)
replicate("customer", customer_copy)
# dimension tables don't scale
for name in ["supplier", "part", "nation", "region"]:
    if ONLY is not None and name not in ONLY:
        continue
    pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"), f"{DST}/{name}.parquet")
    print(f"{name}: copied")
