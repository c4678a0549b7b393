"""Driver-replica correctness gate: run every ``queries()`` entry through
Spark AND its ``oracle_sql()`` through DuckDB on the same parquet tables
(sf0.001 for speed; the real driver uses sf0.01) and compare row count,
column names, and order-insensitive values — the same checks the driver's
CORRECTNESS_r{N}.json records."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("LSE_ENTRY_SF_DIR", "/root/testdata/sf0.001")
# point the golden-fixture oracles (lse/oracle_ops.py) at THIS sf's goldens
os.environ["LSE_GOLDEN_SF"] = os.path.basename(SF_DIR.rstrip("/"))
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


def test_oracle_keys_subset_of_queries():
    assert set(entry_mod.oracle_sql().keys()) <= set(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    """Entries without an oracle must still execute and return a stable
    schema (the driver records a rows-only check for them)."""
    df = entry_mod.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns, name
    assert len(rows) >= 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_vs_duckdb_oracle(spark, ddb, name, monkeypatch):
    # golden-fixture oracles resolve their parquet path at call time
    monkeypatch.setenv("LSE_GOLDEN_SF", os.path.basename(SF_DIR.rstrip("/")))
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = q(spark, SF_DIR).toPandas()
    want = ddb.execute(sql).df()
    assert sorted(got.columns) == sorted(want.columns), f"{name}: column names"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    g, w = normalize(got), normalize(want)
    for col in g.columns:
        gv, wv = g[col], w[col]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            assert all(
                (math.isnan(a) and math.isnan(b)) or abs(a - b) <= 1e-9
                for a, b in zip(gv.astype(float), wv.astype(float))
            ), f"{name}: float column {col}"
        else:
            assert gv.astype(str).tolist() == wv.astype(str).tolist(), f"{name}: column {col}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert df.columns == ["doc_id", "score"]
    assert len(rows) >= 0
