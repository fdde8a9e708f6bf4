#!/usr/bin/env python3
"""Scale-up generator: builds an sfN directory by tiling an existing sf
directory K times with key-space offsets (dev tooling, like check_oracle.py
— the Scala library itself never depends on Python).

The driver's corpus stops at sf0.1; the VERDICT's top round-5 ask is to run
the full oracle + bench gate at 10x that. /root/testdata is read-only, so
the scaled corpus lives under the repo (gitignored) and is DERIVED from
sf0.1 deterministically — no RNG anywhere, so reruns are bit-identical.

Tiling rules (copy k of K, copy 0 = identity):
- every table's primary key shifts by k * (original key-space size), and
  every foreign key shifts by the SAME amount as the table it references,
  so join fan-ins/fan-outs are preserved exactly;
- events.user_id 0 stays 0 (the invalid-account marker rows must remain
  invalid); event_id offsets are multiples of 10 so the `% 10` tombstone
  pattern is preserved;
- timestamps are NOT shifted: the event stream gets 10x denser with 10x
  the accounts — per-account behavior identical to sf0.1, totals 10x;
- documents: copies k>0 replace every 3rd word with a copy-specific token,
  which breaks every 5-gram shingle ACROSS copies (no artificial
  everything-is-a-dup corpus) while preserving near-dup pairs WITHIN a
  copy (both members get identical positional replacements) — dup
  clusters scale 10x in count, not in size;
- embeddings: copies k>0 are mixed with a rolled copy of themselves
  (cos(t)*v + sin(t)*roll(v, k)), dropping cross-copy cosine well under
  near-dup thresholds while roughly preserving within-copy geometry.

Usage: python3 scripts/gen_sf.py /root/testdata/sf0.1 testdata/sf1 10
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src, dst, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)

# key-space size per table (offset unit); FK columns use the referenced
# table's unit
UNITS = {
    "customer": 15000, "supplier": 1000, "part": 20000, "orders": 150000,
    "events": 100000, "documents": 5000, "embeddings": 2000,
    "events_user": 1500,
}


def shifted(col: pa.ChunkedArray, k: int, unit: int, keep_zero=False):
    a = col.to_numpy(zero_copy_only=False)
    out = a + k * unit
    if keep_zero:
        out = np.where(a == 0, 0, out)
    return pa.array(out, type=col.type)


def tile(name, copy_fn):
    t = pq.read_table(f"{src}/{name}.parquet")
    copies = [copy_fn(t, k) for k in range(K)]
    out = pa.concat_tables(copies).cast(t.schema)
    pq.write_table(out, f"{dst}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def set_cols(t, **cols):
    for cname, arr in cols.items():
        t = t.set_column(t.schema.get_field_index(cname), cname, arr)
    return t


def mutate_text(text: str, k: int) -> str:
    words = text.split(" ")
    for i in range(0, len(words), 3):
        words[i] = f"g{k}w{i % 7}"
    return " ".join(words)


def doc_copy(t, k):
    if k == 0:
        return t
    texts = [mutate_text(s, k) for s in t.column("text").to_pylist()]
    return set_cols(
        t,
        doc_id=shifted(t.column("doc_id"), k, UNITS["documents"]),
        text=pa.array(texts, type=pa.string()),
        n_chars=pa.array([len(s) for s in texts], type=pa.int64()),
    )


def emb_copy(t, k):
    if k == 0:
        return t
    m = np.stack(
        [np.asarray(v, dtype=np.float32)
         for v in t.column("embedding").to_pylist()])
    theta = 0.6
    mixed = np.float32(np.cos(theta)) * m + \
        np.float32(np.sin(theta)) * np.roll(m, k, axis=1)
    return set_cols(
        t,
        vec_id=shifted(t.column("vec_id"), k, UNITS["embeddings"]),
        embedding=pa.array(list(mixed), type=t.column("embedding").type),
    )


tile("region", lambda t, k: t if k == 0 else t.slice(0, 0))
tile("nation", lambda t, k: t if k == 0 else t.slice(0, 0))
tile("customer", lambda t, k: set_cols(
    t, c_custkey=shifted(t.column("c_custkey"), k, UNITS["customer"])))
tile("supplier", lambda t, k: set_cols(
    t, s_suppkey=shifted(t.column("s_suppkey"), k, UNITS["supplier"])))
tile("part", lambda t, k: set_cols(
    t, p_partkey=shifted(t.column("p_partkey"), k, UNITS["part"])))
tile("orders", lambda t, k: set_cols(
    t,
    o_orderkey=shifted(t.column("o_orderkey"), k, UNITS["orders"]),
    o_custkey=shifted(t.column("o_custkey"), k, UNITS["customer"])))
tile("lineitem", lambda t, k: set_cols(
    t,
    l_orderkey=shifted(t.column("l_orderkey"), k, UNITS["orders"]),
    l_partkey=shifted(t.column("l_partkey"), k, UNITS["part"]),
    l_suppkey=shifted(t.column("l_suppkey"), k, UNITS["supplier"])))
tile("events", lambda t, k: set_cols(
    t,
    event_id=shifted(t.column("event_id"), k, UNITS["events"]),
    user_id=shifted(t.column("user_id"), k, UNITS["events_user"],
                    keep_zero=True)))
tile("documents", doc_copy)
tile("embeddings", emb_copy)
print("done:", dst)
