import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small & fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from lse.session import get_spark

    s = get_spark("lse-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_index(spark, tmp_path_factory):
    """A built index over the deterministic synthetic corpus, shared by
    engine tests. Returns (index_dir, docs_pandas)."""
    from lse.build import build_index
    from lse.fixtures import make_repos_df

    index_dir = str(tmp_path_factory.mktemp("idx") / "index")
    source = make_repos_df(spark, n_docs=150, partitions=4)
    res = build_index(spark, source, index_dir, n_buckets=4, index_partitions=4)
    assert res is not None
    docs_pdf = (
        spark.read.parquet(os.path.join(index_dir, "docs")).toPandas()
    )
    return index_dir, docs_pdf
