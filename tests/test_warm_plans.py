"""Physical-plan contract for warm serving: after SearchEngine.warm(), the
bucket kernels' ``groupBy("bucket")`` must find the cached postings already
hash-partitioned by bucket, so Catalyst plans NO Exchange above the cache —
a warm top-k is one stage (cached scan → kernel → TakeOrdered)."""

import io
from contextlib import redirect_stdout

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lse.engine import SearchEngine


@pytest.fixture(scope="module")
def warm_engine(spark, fixture_index):
    index_dir, _ = fixture_index
    return SearchEngine(spark, index_dir).warm()


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _above_cache(plan: str) -> str:
    """The executed-plan portion ABOVE the InMemoryRelation (whose child
    legitimately contains warm()'s one-time repartition Exchange)."""
    cut = plan.find("InMemoryRelation")
    return plan[:cut] if cut >= 0 else plan


def test_bucket_group_has_no_exchange(spark, warm_engine):
    eng = warm_engine

    def ident(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})

    df = (
        eng.postings.filter(F.col("term").isin(["java", "python"]))
        .groupBy("bucket")
        .applyInPandas(ident, "doc_id long")
    )
    above = _above_cache(_plan_of(df))
    assert "FlatMapGroupsInPandas" in above
    assert "Exchange" not in above, above


def test_positions_cogroup_has_no_exchange(spark, warm_engine):
    eng = warm_engine
    if eng.positions is None:
        pytest.skip("index built without positions")

    def ident(key, a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})

    df = (
        eng.postings.groupBy("bucket")
        .cogroup(eng.positions.groupBy("bucket"))
        .applyInPandas(ident, "doc_id long")
    )
    above = _above_cache(_plan_of(df))
    assert "FlatMapCoGroupsInPandas" in above
    assert "Exchange" not in above, above


def test_term_filter_prunes_on_cached_batches(spark, warm_engine):
    """sortWithinPartitions('term') at warm time keeps per-batch min/max
    stats tight — the scan must carry the term predicate down to the
    in-memory scan node."""
    eng = warm_engine
    plan = _plan_of(eng.postings.filter(F.col("term") == "java"))
    assert "InMemoryTableScan" in plan
    assert "java" in plan  # predicate reached the cache scan arguments
