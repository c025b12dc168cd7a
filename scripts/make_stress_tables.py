#!/usr/bin/env python3
"""Build a consistent key-offset Nx replication of every sf table.

Usage: python3 scripts/make_stress_tables.py <src_sf_dir> <dst_dir> [factor]

The round-6 10x full-suite recipe, committed (it was ad-hoc then): each
fact/dim copy k < factor offsets its keys so joins stay referentially
intact across copies —

    l_orderkey / o_orderkey   +1e8 * k
    l_partkey  / p_partkey    +1e7 * k
    o_custkey  / c_custkey    +1e7 * k
    l_suppkey  / s_suppkey    +1e6 * k
    event_id                  +1e7 * k
    user_id                   +1e6 * k

Schemas are preserved verbatim (events.ts stays in whatever physical form
the source generation used — TIMESTAMP(NANOS) long or TIMESTAMP(MICROS)).
`documents` is the adversarial mutated corpus from make_stress_docs.py
(near-replicas, zero new tokens); `region`, `nation` stay 1x (nation keys
are referenced unchanged from the replicated dims).

`embeddings` is replicated by ROTATION (round-9, committing the round-6
ad-hoc recipe): copy k applies a block-diagonal 2D rotation by k*0.03 rad
across the 32 (even, odd) dim pairs, which preserves norms and gives every
replica a uniform cosine of cos(k*0.03) = 0.9996 with its original — dense
near-duplicate structure without exact duplicates, adversarial for the
q39/q134 near-dup thresholds and natural for the q41/q130 recall gates.
vec_id' = vec_id + 1e6 * k; labels carry over (a rotated class-c vector is
still class c). Float32 end-to-end to match the schema.
"""
import math
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from make_stress_docs import main as make_docs

OFFSETS = {
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**7, "l_suppkey": 10**6},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**7},
    "events": {"event_id": 10**7, "user_id": 10**6},
}

COPY_1X = ["region", "nation"]


def replicate_embeddings(src: str, dst: str, factor: int) -> None:
    t = pq.read_table(src)
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = vecs.shape
    ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    out_ids, out_vecs, out_labels = [], [], []
    for k in range(factor):
        if k == 0:
            rot = vecs
        else:
            th = 0.03 * k
            c, s = np.float32(math.cos(th)), np.float32(math.sin(th))
            rot = np.empty_like(vecs)
            rot[:, 0::2] = c * vecs[:, 0::2] - s * vecs[:, 1::2]
            rot[:, 1::2] = s * vecs[:, 0::2] + c * vecs[:, 1::2]
        out_ids.append(ids + 10**6 * k)
        out_vecs.append(rot)
        out_labels.append(labels)
    all_vecs = np.concatenate(out_vecs)
    emb = pa.array(list(all_vecs), type=pa.list_(pa.float32()))
    out = pa.table({
        "vec_id": pa.array(np.concatenate(out_ids), type=t.schema.field("vec_id").type),
        "embedding": emb,
        "label": pa.array(np.concatenate(out_labels), type=t.schema.field("label").type),
    })
    pq.write_table(out, dst)


def replicate(src: str, dst: str, offsets: dict, factor: int) -> None:
    t = pq.read_table(src)
    copies = []
    for k in range(factor):
        cols = []
        for name in t.column_names:
            col = t.column(name)
            if k > 0 and name in offsets:
                col = pa.compute.add(col, pa.scalar(offsets[name] * k, type=col.type))
            cols.append(col)
        copies.append(pa.table(dict(zip(t.column_names, cols)), schema=t.schema))
    pq.write_table(pa.concat_tables(copies), dst)


def main(src_dir: str, dst_dir: str, factor: int = 10) -> None:
    # documents (mutated) + every table hard-copied; replicated ones are
    # then overwritten with their Nx versions.
    make_docs(src_dir, dst_dir, factor)
    for name, offs in OFFSETS.items():
        replicate(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet",
                  offs, factor)
        print(f"replicated {name} x{factor}")
    replicate_embeddings(f"{src_dir}/embeddings.parquet",
                         f"{dst_dir}/embeddings.parquet", factor)
    print(f"replicated embeddings x{factor} (rotated)")
    for name in COPY_1X:
        shutil.copy(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet")
    print(f"done: {dst_dir}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
