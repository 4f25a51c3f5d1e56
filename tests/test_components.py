"""Connected components (large-star/small-star) + dedup resolution."""

import random

import pytest
from pyspark.sql import functions as F

from tsengine.operators import components as C
from tsengine.operators import dedup


def _cc_oracle(edges, nodes):
    """Union-find reference."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labeling
    out = {}
    for n in nodes:
        r = find(n)
        out[n] = min(out.get(r, r), r)
    return {n: find(n) for n in nodes}


def test_cc_small_known(spark):
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["component"] for r in C.connected_components(pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_cc_random_vs_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = _cc_oracle(edges, {n for e in edges for n in e})
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["node"]: r["component"] for r in C.connected_components(pairs).collect()}
    assert got == want


def test_cc_chain_converges_logarithmically(spark):
    # a path graph is the worst case for min-label propagation (O(n) rounds);
    # the star algorithm must close a 128-chain in O(log n) rounds
    n = 128
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats = {}
    got = C.connected_components(pairs, stats=stats).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == n
    assert stats["rounds"] <= 12, stats


def test_cc_requires_convergence(spark):
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError):
        C.connected_components(pairs, max_iter=0)


def test_dedup_resolve_full_pipeline(spark):
    rows = [
        (0, "the cat sat on the mat and the dog sat too"),
        (1, "the cat sat on the mat and the dog sat too"),
        (2, "the cat sat on the mat and the dog stood too"),
        (3, "el perro y el gato que corren en la casa de los"),
        (4, "completely different words about spark query engines"),
        (5, "  the   cat sat on the mat and the dog sat too  "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.lsh_candidate_pairs(docs, num_hashes=16, bands=8)
    res = {r["doc_id"]: r for r in C.dedup_resolve(docs, pairs).collect()}
    # 0,1,5 are dups (2 likely joins via near-dup bands); 3 and 4 isolated
    assert res[0]["component"] == 0 and res[0]["is_canonical"]
    assert res[1]["component"] == 0 and not res[1]["is_canonical"]
    assert res[5]["component"] == 0 and not res[5]["is_canonical"]
    assert res[3]["component"] == 3 and res[3]["is_canonical"]
    assert res[4]["component"] == 4 and res[4]["is_canonical"]
    # the deduplicated corpus keeps exactly one doc per component
    kept = [d for d, r in res.items() if r["is_canonical"]]
    n_comp = len({r["component"] for r in res.values()})
    assert len(kept) == n_comp

def test_cc_reliable_checkpoint_dir(spark, tmp_path):
    """VERDICT r03 task 3: checkpoint_dir switches per-round lineage
    truncation to reliable DataFrame.checkpoint() files under the given
    dir (survives executor loss), with identical results."""
    rng = random.Random(11)
    edges = [(rng.randrange(100), rng.randrange(100)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    ckdir = str(tmp_path / "cc_ckpt")
    local = {r["node"]: r["component"]
             for r in C.connected_components(pairs).collect()}
    reliable = {r["node"]: r["component"]
                for r in C.connected_components(
                    pairs, checkpoint_dir=ckdir).collect()}
    assert reliable == local
    # reliable checkpoint actually wrote RDD snapshot files to the dir
    import os
    found = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert found, "no reliable checkpoint files written"
    # dedup_resolve passes the dir through
    docs = spark.createDataFrame(
        [(n,) for n in range(100)], "doc_id long")
    res = C.dedup_resolve(docs, pairs, checkpoint_dir=str(tmp_path / "cc2"))
    assert res.count() == 100
