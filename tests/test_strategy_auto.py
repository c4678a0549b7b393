"""strategy='auto' block-max routing: WAND when the one-pass block-bound
stats say pruning will bite (skewed scores — the regime the reference's
skip lists target, storage/PostingsWriter.java:48-60), bucket kernel when
scores are uniform and nothing can prune. All strategies stay exact."""

import pytest

from lse.build import build_index
from lse.engine import SearchEngine
from lse.fixtures import make_repos_df, make_skewed_df


@pytest.fixture(scope="module")
def skewed_engine(spark, tmp_path_factory):
    # rare df ≈ 15 vs hot df = 30k: inside the ≳1000× df-ratio win regime
    d = str(tmp_path_factory.mktemp("skew") / "idx")
    src = make_skewed_df(spark, 30_000, partitions=4, spike_every=97, rare_every=2000)
    build_index(spark, src, d, precomputed_doc_id=True, n_buckets=2, index_partitions=4)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def uniform_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("uni") / "idx")
    build_index(spark, make_repos_df(spark, 1500, partitions=4), d,
                n_buckets=2, index_partitions=4)
    return SearchEngine(spark, d)


def test_auto_picks_wand_on_skewed_scores(skewed_engine):
    eng = skewed_engine
    assert eng.choose_topk_strategy(["rare", "hot"]) == "wand"
    assert eng.choose_topk_strategy(["rare", "rare2", "hot"]) == "wand"
    assert eng.choose_topk_strategy(["rare", "hot"], conjunctive=True) == "wand"


def test_auto_picks_bucket_on_uniform_scores(uniform_engine):
    eng = uniform_engine
    assert eng.choose_topk_strategy(["java", "spark"]) == "bucket"
    assert (
        eng.choose_topk_strategy(["spark", "query", "join", "merge"]) == "bucket"
    )


def test_auto_picks_bucket_for_fat_companions(skewed_engine):
    """warm1/warm2 are df≈N/11 lists: each companion posting is a Python
    WAND event, so decode-everything wins — even though the BOUNDS would
    prune (the df-ratio gate must veto)."""
    eng = skewed_engine
    assert (
        eng.choose_topk_strategy(["rare", "hot", "warm1", "warm2"]) == "bucket"
    )
    assert eng.choose_topk_strategy(["hot"]) == "bucket"  # single term


def test_auto_unknown_terms_fall_back_to_bucket(uniform_engine):
    assert uniform_engine.choose_topk_strategy(["zzzznothere"]) == "bucket"


@pytest.mark.parametrize("q", ["rare OR hot", "rare AND hot",
                               "rare OR hot OR warm1 OR warm2"])
def test_all_strategies_rank_identical_on_skew(skewed_engine, q):
    eng = skewed_engine
    a = eng.search_topk(q, 10)  # auto → wand here
    w = eng.search_topk(q, 10, strategy="wand")
    b = eng.search_topk(q, 10, strategy="bucket")
    assert [d for d, _ in a] == [d for d, _ in w] == [d for d, _ in b]
    for (_, sa), (_, sw), (_, sb) in zip(a, w, b):
        assert sa == pytest.approx(sw, abs=1e-9)
        assert sa == pytest.approx(sb, abs=1e-9)


def test_auto_respects_tombstones(spark, tmp_path):
    """Tombstoned indexes must never route auto → lazy WAND (it needs
    build-exact df/bounds)."""
    import os

    import pandas as pd

    d = str(tmp_path / "idx")
    src = make_skewed_df(spark, 5_000, partitions=2, spike_every=97, rare_every=200)
    build_index(spark, src, d, precomputed_doc_id=True, n_buckets=2, index_partitions=2)
    tomb_dir = os.path.join(d, "tombstones")
    spark.createDataFrame(pd.DataFrame({"doc_id": [7, 207]})).write.parquet(tomb_dir)
    eng = SearchEngine(spark, d)
    assert eng.choose_topk_strategy(["rare", "hot"]) == "bucket"
    # and the query still serves exactly (bucket tier, live-df map)
    hits = eng.search_topk("rare OR hot", 5)
    assert all(doc not in (7, 207) for doc, _ in hits)
