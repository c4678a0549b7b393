"""Doc-id assignment: hash stability, collision guard, dense-mode ordering."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lse.ids import assign_doc_ids


def source(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def test_hash_ids_stable_and_nonnegative(spark):
    rows = [dict(repo="r1", path=f"p{i}", commit="c", content="x") for i in range(50)]
    a = assign_doc_ids(source(spark, rows)).select("path", "doc_id").collect()
    b = assign_doc_ids(source(spark, rows).repartition(7)).select("path", "doc_id").collect()
    am = {r["path"]: r["doc_id"] for r in a}
    bm = {r["path"]: r["doc_id"] for r in b}
    assert am == bm  # invariant under partitioning
    assert all(v >= 0 for v in am.values())


def test_duplicate_key_rejected(spark):
    rows = [
        dict(repo="r", path="same", commit="c", content="a"),
        dict(repo="r", path="same", commit="c", content="b"),
    ]
    with pytest.raises(RuntimeError, match="collision"):
        assign_doc_ids(source(spark, rows))


def test_dense_ids_follow_key_order(spark):
    rows = [
        dict(repo="r", path=f"p{i:03d}", commit="c", content="x") for i in range(40)
    ]
    out = (
        assign_doc_ids(source(spark, rows).repartition(5), mode="dense",
                       dense_partitions=4)
        .orderBy("path")
        .collect()
    )
    assert [r["doc_id"] for r in out] == list(range(40))
