"""Connected-components duplicate clustering (lse.dedup.connected_components).

Large-star/small-star star contraction (Kiveris et al., SoCC 2014) — the
mega-cluster representative pass VERDICT r4 prescribed on top of the LSH
bucket caps. Pinned against a pure-Python union-find on randomized graphs,
a long chain (the diameter case naive label propagation cannot afford at
scale), and the star-pair shape the capped LSH buckets emit.
"""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lse.dedup import (
    connected_components,
    dedup_by_clusters,
    duplicate_clusters,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        if u != v:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    return {n: min(m) for m in comps.values() for n in m}


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]), "doc_a long, doc_b long"
    )
    out = connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in out}


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(11)
    for trial in range(3):
        edges = [
            (rng.randrange(120), rng.randrange(120)) for _ in range(150)
        ]
        got = _cc(spark, edges)
        want = _union_find_components(edges)
        assert got == want, f"trial {trial}"


def test_long_chain_converges_in_logarithmic_rounds(spark):
    # a 200-link chain has diameter 200: naive min-label propagation needs
    # ~200 rounds; star contraction must close it well inside max_iter=12
    edges = [(i, i + 1) for i in range(200)]
    got = _cc(spark, edges, max_iter=12)
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_star_pairs_from_capped_lsh_bucket(spark):
    # the LSH bucket cap emits (rep, member) star pairs for mega-clusters;
    # closure must still yield ONE cluster with the min id as representative
    edges = [(1000, m) for m in range(1001, 1050)]
    edges += [(500, 1000)]  # rep itself near-dups an earlier doc
    clusters = duplicate_clusters(
        spark.createDataFrame(
            pd.DataFrame(edges, columns=["doc_a", "doc_b"]),
            "doc_a long, doc_b long",
        )
    ).collect()
    assert {r["cluster_id"] for r in clusters} == {500}
    assert all(r["cluster_size"] == 51 for r in clusters)


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(3, 3), (4, 5), (5, 4), (4, 5)]
    got = _cc(spark, edges)
    assert got == {4: 4, 5: 4}  # the (3,3) self loop contributes no node


def test_max_iter_backstop_raises(spark):
    edges = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]), "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_dedup_by_clusters_keeps_representative_and_singletons(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(8)), "content": [f"d{i}" for i in range(8)]})
    )
    # clusters {1,2,3} and {5,6}; 0,4,7 unpaired
    pairs = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3), (5, 6)], columns=["doc_a", "doc_b"]),
        "doc_a long, doc_b long",
    )
    kept = sorted(
        r["doc_id"] for r in dedup_by_clusters(docs, pairs).select("doc_id").collect()
    )
    assert kept == [0, 1, 4, 5, 7]
