#!/usr/bin/env python3
"""Build an Nx adversarial near-dup stress corpus from a documents.parquet.

Usage: python3 scripts/make_stress_docs.py <src_sf_dir> <dst_dir> <factor>

Replicates each source document `factor` times (copy k=0 is the original,
byte-identical). Copies k>0 are NEAR-REPLICAS: two token positions, chosen
deterministically from (doc_id, k), are overwritten with OTHER tokens of the
same document. No new tokens are ever introduced, so the corpus-wide shingle
vocabulary does NOT grow with the factor — every shingle stays common, prefix
filters stay maximally ineffective, and candidate density approaches the
worst case for set-similarity join designs (the same scheme as the round-6
10x run described in PLANS.md, extended to any factor).

doc_id' = doc_id + 100000 * k keeps copy-0 ids identical to the source and
id-disjoint across copies (source ids are < 100000 at every published sf).
Every other table the stress dir needs is hard-copied from the source dir so
Bench/Verify work unchanged against the stress dir.

Deterministic: a pure function of (doc_id, k, token stream) — no RNG state.
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "embeddings"]


def mutate(text: str, doc_id: int, k: int) -> str:
    toks = text.split()
    n = len(toks)
    if n < 4:
        # Too short to mutate without new tokens: tag with copy index so the
        # replica is still a distinct document.
        return text + " " + str(k)
    p1 = (doc_id * 31 + k * 7) % n
    p2 = (doc_id * 17 + k * 13 + 3) % n
    q1 = (p1 + 1 + k) % n
    q2 = (p2 + 2 + k) % n
    out = list(toks)
    out[p1] = toks[q1]
    out[p2] = toks[q2]
    return " ".join(out)


def main(src_dir: str, dst_dir: str, factor: int) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    t = pq.read_table(f"{src_dir}/documents.parquet")
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    n = len(cols["doc_id"])
    out = {c: [] for c in t.column_names}
    for k in range(factor):
        for i in range(n):
            did = cols["doc_id"][i]
            text = cols["text"][i] if k == 0 else mutate(cols["text"][i], did, k)
            out["doc_id"].append(did + 100000 * k)
            out["text"].append(text)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(len(text))
    schema = t.schema
    table = pa.table({c: pa.array(out[c], type=schema.field(c).type)
                      for c in t.column_names})
    pq.write_table(table, f"{dst_dir}/documents.parquet")
    for name in TABLES:
        src = f"{src_dir}/{name}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{dst_dir}/{name}.parquet")
    print(f"wrote {len(out['doc_id'])} docs to {dst_dir}/documents.parquet"
          f" (+{sum(1 for x in TABLES if os.path.exists(f'{src_dir}/{x}.parquet'))}"
          " tables copied)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
