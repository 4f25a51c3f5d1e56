"""Deterministic 10x scale-up of a driver testdata dir (VERDICT r04 task 1:
"publish a full sf1.0 sweep ... or a generated sf1 dir").

The driver's generator is not available, so sf1.0 is synthesised FROM sf0.1 by
replication with consistent key remapping — referential integrity holds
(orders.o_custkey -> customer, lineitem.l_orderkey -> orders, ...), per-key
distributions are preserved, and the data volume is exactly 10x.  Correctness
sweeps run Spark and DuckDB on the SAME generated files, so the generation
recipe cannot bias the comparison; what matters is volume and shape.

Scaling choices that keep the workload HONEST rather than degenerate:
  * Fact/dim keys get a per-replica stride offset (power of ten above the
    max key) so every replica is a disjoint key range — joins fan out 10x,
    per-key group sizes stay constant (the realistic growth mode; naive
    concatenation without remapping would grow per-key groups 10x instead).
  * events.user_id is offset too: 10x more series of unchanged length, so
    per-series window chains cost the same and the scan/shuffle volume is
    what grows — matching how a fleet grows (more conversations, not
    10x-longer ones).
  * documents.text: replicas salt every 3rd token with a replica tag.  Every
    3-token shingle then contains a salted token, so cross-replica Jaccard is
    ~0 and near-dup GROUP SIZES stay constant while the number of groups
    grows 10x.  Verbatim replication would instead grow candidate PAIRS
    quadratically (100x) — a different, degenerate workload.  n_chars is
    recomputed from the salted text.
  * embeddings: per-replica seeded coordinate permutation + sign flips — an
    orthogonal transform, so all intra-replica cosines/distances are EXACTLY
    preserved (near-dup structure replicates) while cross-replica cosines are
    scrambled noise.  vec_id gets the stride offset.
  * region/nation are dimension constants: copied verbatim.

Usage: python scripts/gen_sf.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/tsengine_sf1.0 10
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260819


def stride_for(maxkey: int) -> int:
    return 10 ** (int(math.floor(math.log10(max(maxkey, 1)))) + 1)


def salt_text(texts, k: int) -> list[str]:
    out = []
    tag = f"r{k}x"
    for t in texts:
        if t is None:
            out.append(None)
            continue
        words = t.split(" ")
        for i in range(2, len(words), 3):
            words[i] = tag + words[i]
        out.append(" ".join(words))
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/tsengine_sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    def read(name):
        return pq.read_table(f"{src}/{name}.parquet")

    def write(name, tbl):
        pq.write_table(tbl, f"{dst}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows")

    # dimension constants: verbatim
    for name in ("region", "nation"):
        write(name, read(name))

    # key strides, computed once from the source so replicas are disjoint
    tabs = {n: read(n) for n in (
        "customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings",
    )}
    strides = {
        "c_custkey": stride_for(pa.compute.max(tabs["customer"]["c_custkey"]).as_py()),
        "s_suppkey": stride_for(pa.compute.max(tabs["supplier"]["s_suppkey"]).as_py()),
        "p_partkey": stride_for(pa.compute.max(tabs["part"]["p_partkey"]).as_py()),
        "o_orderkey": stride_for(pa.compute.max(tabs["orders"]["o_orderkey"]).as_py()),
        "event_id": stride_for(pa.compute.max(tabs["events"]["event_id"]).as_py()),
        "user_id": stride_for(pa.compute.max(tabs["events"]["user_id"]).as_py()),
        "doc_id": stride_for(pa.compute.max(tabs["documents"]["doc_id"]).as_py()),
        "vec_id": stride_for(pa.compute.max(tabs["embeddings"]["vec_id"]).as_py()),
    }
    # which columns of each table shift by which stride
    keymap = {
        "customer": {"c_custkey": "c_custkey"},
        "supplier": {"s_suppkey": "s_suppkey"},
        "part": {"p_partkey": "p_partkey"},
        "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
        "lineitem": {
            "l_orderkey": "o_orderkey",
            "l_partkey": "p_partkey",
            "l_suppkey": "s_suppkey",
        },
        "events": {"event_id": "event_id", "user_id": "user_id"},
        "documents": {"doc_id": "doc_id"},
        "embeddings": {"vec_id": "vec_id"},
    }

    emb0 = tabs["embeddings"]["embedding"].combine_chunks()
    dim = len(emb0[0])
    emb_mat = np.asarray(emb0.flatten(), dtype=np.float32).reshape(-1, dim)

    for name, tbl in tabs.items():
        reps = []
        for k in range(factor):
            cols = {}
            for col in tbl.column_names:
                arr = tbl[col]
                if col in keymap[name] and k > 0:
                    off = k * strides[keymap[name][col]]
                    arr = pa.compute.add(arr, pa.scalar(off, type=arr.type))
                cols[col] = arr.combine_chunks() if k == 0 else arr
            if name == "documents" and k > 0:
                salted = salt_text(cols["text"].to_pylist(), k)
                cols["text"] = pa.array(salted, type=pa.string())
                cols["n_chars"] = pa.array(
                    [None if t is None else len(t) for t in salted],
                    type=pa.int64(),
                )
            if name == "embeddings" and k > 0:
                rng = np.random.RandomState(SEED + k)
                perm = rng.permutation(dim)
                signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
                mat = emb_mat[:, perm] * signs
                cols["embedding"] = pa.array(
                    list(mat), type=pa.list_(pa.float32())
                )
            reps.append(pa.table(cols, schema=pa.schema(
                [(c, cols[c].type) for c in tbl.column_names]
            )))
        write(name, pa.concat_tables(reps))


if __name__ == "__main__":
    main()
