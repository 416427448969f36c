#!/usr/bin/env python3
"""Scale-checkpoint data builder (driver-side tooling, NOT library
code): synthesize sf1 (~10x sf0.1) under /tmp by key-shifted
replication of the driver-generated sf0.1 tables, so BENCH_SF1.json can
test the ~linear-scaling claim without regenerating the official
testdata (which is read-only and driver-owned).

Fidelity rules:
 - fact/dim keys shift by copy*stride (stride = max key + 1), so join
   cardinalities and selectivities scale with the data: every lineitem
   still matches exactly one order/part/supplier, every order one
   customer. nation/region stay fixed (TPC-H dimensions do not scale).
 - events keep their time window (10x density, the realistic scale-up
   for windowed aggregation); event/user ids shift.
 - documents: a verbatim 10x copy would make every doc 9 exact
   near-duplicates and blow pair counts quadratically — copies >0 tag
   every 6th token with the copy ordinal (every 13-gram shingle crosses
   a tagged token, so cross-copy Jaccard ~ 0) while within-copy planted
   duplicate structure is preserved identically. n_chars recomputed.
 - embeddings: per-row deterministic noise at unit scale pushes
   cross-copy cosine to ~0.7 (below every near-dup threshold) without
   correlating rows of one copy.

Usage: python3 scripts/make_sf1.py [src_dir] [out_dir] [copies]
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)

con = duckdb.connect()


def stride(table, key):
    return con.sql(
        f"SELECT max({key}) + 1 FROM '{src}/{table}.parquet'").fetchone()[0]


KO = stride("orders", "o_orderkey")
KC = stride("customer", "c_custkey")
KS = stride("supplier", "s_suppkey")
KP = stride("part", "p_partkey")
KE = stride("events", "event_id")
KU = con.sql(f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
KD = stride("documents", "doc_id")
KV = stride("embeddings", "vec_id")


def replicate(table, shifts):
    """UNION ALL of `copies` key-shifted copies -> out parquet."""
    sel = []
    for k in range(copies):
        cols = ", ".join(
            f"({c} + {k} * {s})::BIGINT AS {c}" if s else c
            for c, s in shifts)
        sel.append(f"SELECT {cols} FROM '{src}/{table}.parquet'")
    con.sql(f"COPY ({' UNION ALL '.join(sel)}) TO '{out}/{table}.parquet' "
            "(FORMAT PARQUET)")
    print(table, con.sql(
        f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0])


replicate("lineitem", [("l_orderkey", KO), ("l_partkey", KP),
                       ("l_suppkey", KS), ("l_linenumber", None),
                       ("l_quantity", None), ("l_extendedprice", None),
                       ("l_discount", None), ("l_tax", None),
                       ("l_returnflag", None), ("l_linestatus", None),
                       ("l_shipdate", None)])
replicate("orders", [("o_orderkey", KO), ("o_custkey", KC),
                     ("o_orderstatus", None), ("o_totalprice", None),
                     ("o_orderdate", None), ("o_orderpriority", None)])
replicate("customer", [("c_custkey", KC), ("c_name", None),
                       ("c_nationkey", None), ("c_acctbal", None),
                       ("c_mktsegment", None)])
replicate("supplier", [("s_suppkey", KS), ("s_name", None),
                       ("s_nationkey", None), ("s_acctbal", None)])
replicate("part", [("p_partkey", KP), ("p_name", None), ("p_brand", None),
                   ("p_type", None), ("p_size", None),
                   ("p_retailprice", None)])
for dim in ("nation", "region"):
    con.sql(f"COPY (SELECT * FROM '{src}/{dim}.parquet') "
            f"TO '{out}/{dim}.parquet' (FORMAT PARQUET)")
    print(dim, "copied")
replicate("events", [("event_id", KE), ("ts", None), ("user_id", KU),
                     ("event_type", None), ("value", None),
                     ("props", None)])

# documents: python-side token tagging for copies > 0
docs = con.sql(f"SELECT * FROM '{src}/documents.parquet' ORDER BY doc_id"
               ).fetchall()
rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for k in range(copies):
    for doc_id, text, lang, source, _ in docs:
        if k > 0:
            toks = text.split(" ")
            toks = [t + f"~{k}" if i % 6 == 5 else t
                    for i, t in enumerate(toks)]
            text = " ".join(toks)
        rows["doc_id"].append(doc_id + k * KD)
        rows["text"].append(text)
        rows["lang"].append(lang)
        rows["source"].append(source)
        rows["n_chars"].append(len(text))
pq.write_table(pa.table(rows, schema=pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())])),
    f"{out}/documents.parquet")
print("documents", len(rows["doc_id"]))

# embeddings: per-row deterministic unit-scale noise for copies > 0
emb = con.sql(f"SELECT vec_id, embedding, label "
              f"FROM '{src}/embeddings.parquet' ORDER BY vec_id").fetchall()
ids, vecs, labels = [], [], []
for k in range(copies):
    for vec_id, v, label in emb:
        a = np.asarray(v, dtype=np.float32)
        if k > 0:
            rng = np.random.default_rng(vec_id * 1000003 + k)
            g = rng.standard_normal(a.shape).astype(np.float32)
            g *= np.linalg.norm(a) / max(np.linalg.norm(g), 1e-9)
            a = a + g
        ids.append(vec_id + k * KV)
        vecs.append(a.tolist())
        labels.append(label)
pq.write_table(pa.table(
    {"vec_id": ids, "embedding": vecs, "label": labels},
    schema=pa.schema([("vec_id", pa.int64()),
                      ("embedding", pa.list_(pa.float32())),
                      ("label", pa.int32())])),
    f"{out}/embeddings.parquet")
print("embeddings", len(ids))
print("done:", out)
