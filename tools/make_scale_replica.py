"""Build a ~10x scale-up of /root/testdata/sf0.1 for OPTIMIZATION
measurement only (the driver's own sf1.0 data is not present in this
sandbox; this replica matches its row counts and per-table
distributions so before/after walls are comparable *within* this
session — it is NOT byte-identical to the driver's generator output
and is never used for correctness oracles).

Construction, per table (copy k = 0 is the original rows, k = 1..9
are shifted copies; every foreign-key domain gets one consistent
offset so joins land exactly like the original):

- documents: per-row word-order shuffle seeded by (k, doc_id) — same
  multiset of space-joined words, so identical length/vocabulary
  distributions, but fresh shingle sets (a verbatim copy would plant
  9 exact dups per doc and blow candidate volumes far past the real
  generator's dup rate).
- embeddings: fresh seeded unit normals (the originals are uniform
  random directions; verbatim copies would plant cosine-1.0 dup
  cliques).  float32, labels uniform 0-9.
- events: event_id/user_id shifted (sessions replicate per-user).
- lineitem/orders/customer/part/supplier: key domains shifted by
  k * (max_key + 1); all non-key columns untouched.
- nation/region: copied as-is (dimension tables).

Usage: python tools/make_scale_replica.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _shift(tb: pa.Table, col: str, off: int) -> pa.Table:
    i = tb.schema.get_field_index(col)
    return tb.set_column(
        i, tb.schema.field(i), pc.add(tb.column(col), off)
    )


def main(out: str = "/dev/shm/sf1.0r", copies: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    load = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in [
            "documents", "embeddings", "events", "lineitem",
            "orders", "customer", "part", "supplier", "nation",
            "region",
        ]
    }

    # consistent per-domain offsets
    base = {
        "order": pc.max(load["orders"].column("o_orderkey")).as_py() + 1,
        "cust": pc.max(load["customer"].column("c_custkey")).as_py() + 1,
        "part": pc.max(load["part"].column("p_partkey")).as_py() + 1,
        "supp": pc.max(load["supplier"].column("s_suppkey")).as_py() + 1,
        "doc": pc.max(load["documents"].column("doc_id")).as_py() + 1,
        "vec": pc.max(load["embeddings"].column("vec_id")).as_py() + 1,
        "event": pc.max(load["events"].column("event_id")).as_py() + 1,
        "user": pc.max(load["events"].column("user_id")).as_py() + 1,
    }

    for t in ["nation", "region"]:
        pq.write_table(load[t], f"{out}/{t}.parquet")

    def shifted_copies(tb, shifts):  # [(col, domain)]
        parts = [tb]
        for k in range(1, copies):
            c = tb
            for col, dom in shifts:
                c = _shift(c, col, k * base[dom])
            parts.append(c)
        return pa.concat_tables(parts)

    pq.write_table(
        shifted_copies(
            load["lineitem"],
            [("l_orderkey", "order"), ("l_partkey", "part"),
             ("l_suppkey", "supp")],
        ),
        f"{out}/lineitem.parquet",
    )
    pq.write_table(
        shifted_copies(
            load["orders"], [("o_orderkey", "order"), ("o_custkey", "cust")]
        ),
        f"{out}/orders.parquet",
    )
    pq.write_table(
        shifted_copies(load["customer"], [("c_custkey", "cust")]),
        f"{out}/customer.parquet",
    )
    pq.write_table(
        shifted_copies(load["part"], [("p_partkey", "part")]),
        f"{out}/part.parquet",
    )
    pq.write_table(
        shifted_copies(load["supplier"], [("s_suppkey", "supp")]),
        f"{out}/supplier.parquet",
    )
    pq.write_table(
        shifted_copies(
            load["events"], [("event_id", "event"), ("user_id", "user")]
        ),
        f"{out}/events.parquet",
    )

    # documents: word-shuffle per copy
    docs = load["documents"]
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    srcs = docs.column("source").to_pylist()
    out_rows = {"doc_id": [], "text": [], "lang": [], "source": [],
                "n_chars": []}

    def push(i, k, txt):
        out_rows["doc_id"].append(ids[i] + k * base["doc"])
        out_rows["text"].append(txt)
        out_rows["lang"].append(langs[i])
        out_rows["source"].append(srcs[i])
        out_rows["n_chars"].append(len(txt))

    for i in range(len(ids)):
        push(i, 0, texts[i])
    for k in range(1, copies):
        rng = np.random.RandomState(100003 * k)
        for i in range(len(ids)):
            words = texts[i].split(" ")
            rng.shuffle(words)
            push(i, k, " ".join(words))
    pq.write_table(
        pa.table(out_rows, schema=docs.schema), f"{out}/documents.parquet"
    )

    # embeddings: fresh unit normals per copy
    emb = load["embeddings"]
    dim = len(emb.column("embedding")[0])
    n = emb.num_rows
    vecs = [emb]
    for k in range(1, copies):
        rng = np.random.RandomState(777 + k)
        m = rng.randn(n, dim).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        m = m.astype(np.float32)
        vecs.append(
            pa.table(
                {
                    "vec_id": pa.array(
                        [v + k * base["vec"] for v in
                         emb.column("vec_id").to_pylist()],
                        type=pa.int64(),
                    ),
                    "embedding": pa.array(
                        [row.tolist() for row in m],
                        type=emb.schema.field("embedding").type,
                    ),
                    "label": pa.array(
                        rng.randint(0, 10, size=n).astype(np.int32),
                        type=pa.int32(),
                    ),
                },
                schema=emb.schema,
            )
        )
    pq.write_table(pa.concat_tables(vecs), f"{out}/embeddings.parquet")
    print("wrote", out, "copies:", copies)


if __name__ == "__main__":
    main(*[
        (int(a) if a.isdigit() else a) for a in sys.argv[1:]
    ])
