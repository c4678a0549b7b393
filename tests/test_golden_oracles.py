"""Golden-fixture oracle lane (lse/oracle_ops.py + goldens/):

1. staleness — the committed golden parquet must equal a fresh replica run
   over the live testdata (catches driver-side testdata regeneration);
2. parity — the Spark operator output must equal the golden EXACTLY
   (bitwise, after both sides' HALF_UP rounding);
3. the oracle SQL registered in __spark_entry__ must run in a plain DuckDB
   connection and reproduce the golden (what the driver executes).
"""

import os

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry
from lse.oracle_ops import GOLDEN_OPS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "sf0.01"
SF_DIR = f"/root/testdata/{SF}"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, ctx: str):
    a, b = _norm(a), _norm(b)
    assert list(a.columns) == list(b.columns), ctx
    assert len(a) == len(b), f"{ctx}: {len(a)} vs {len(b)} rows"
    for c in a.columns:
        av = a[c].to_numpy()
        bv = b[c].to_numpy(dtype=a[c].dtype)
        assert (av == bv).all(), f"{ctx}: column {c} differs"


@pytest.fixture(scope="module")
def inputs():
    return {
        "documents": pd.read_parquet(os.path.join(SF_DIR, "documents.parquet")),
        "embeddings": pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet")),
    }


@pytest.mark.parametrize("name", sorted(GOLDEN_OPS))
def test_committed_golden_is_fresh(name, inputs):
    table, fn = GOLDEN_OPS[name]
    fresh = fn(inputs[table])
    committed = pd.read_parquet(os.path.join(REPO, "goldens", SF, f"{name}.parquet"))
    _assert_frames_equal(fresh, committed, f"stale golden {name}")


@pytest.mark.parametrize("name", sorted(GOLDEN_OPS))
def test_spark_output_matches_golden(name, spark):
    committed = pd.read_parquet(os.path.join(REPO, "goldens", SF, f"{name}.parquet"))
    out = entry.queries()[name](spark, SF_DIR).toPandas()
    _assert_frames_equal(committed, out, f"spark vs golden {name}")


@pytest.mark.parametrize("name", sorted(GOLDEN_OPS))
def test_oracle_sql_reproduces_golden(name, monkeypatch):
    import duckdb

    monkeypatch.setenv("LSE_GOLDEN_SF", SF)  # resolve against sf0.01 goldens
    sql = entry.oracle_sql()[name]
    got = duckdb.connect().execute(sql).df()
    committed = pd.read_parquet(os.path.join(REPO, "goldens", SF, f"{name}.parquet"))
    _assert_frames_equal(committed, got, f"duckdb vs golden {name}")
