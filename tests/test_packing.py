"""Sequence packing (lse.packing.assign_pack_ids): the distributed
two-phase prefix sum must equal the single-partition window cumsum, with
the exclusive-prefix pack definition."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lse.packing import assign_pack_ids


def _table(spark, tokens):
    return spark.createDataFrame(
        [(i, int(t)) for i, t in enumerate(tokens)], "doc_id long, n_tokens long"
    )


def _reference(tokens, budget):
    out, run = [], 0
    for t in tokens:
        out.append(run // budget)
        run += t
    return out


@pytest.mark.parametrize("n_parts", [1, 3, 16])
def test_matches_serial_reference(spark, n_parts):
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, 400, size=300).tolist()
    got = {
        r["doc_id"]: r["pack_id"]
        for r in assign_pack_ids(
            _table(spark, tokens), budget=512, n_parts=n_parts
        ).collect()
    }
    want = _reference(tokens, 512)
    assert [got[i] for i in range(len(tokens))] == want


def test_pack_invariants(spark):
    rng = np.random.default_rng(11)
    tokens = rng.integers(1, 300, size=400).tolist()
    rows = sorted(
        assign_pack_ids(_table(spark, tokens), budget=1000).collect(),
        key=lambda r: r["doc_id"],
    )
    packs = [r["pack_id"] for r in rows]
    assert packs == sorted(packs)  # monotone in doc order
    assert packs[0] == 0
    # a pack's token total exceeds budget only via its final straddling doc
    sums = {}
    for r in rows:
        sums[r["pack_id"]] = sums.get(r["pack_id"], 0) + r["n_tokens"]
    for p, s in sums.items():
        assert s < 1000 + 300, (p, s)


def test_empty_and_zero_budget(spark):
    empty = assign_pack_ids(_table(spark, []), budget=10)
    assert empty.count() == 0 and "pack_id" in empty.columns
    with pytest.raises(ValueError):
        assign_pack_ids(_table(spark, [1]), budget=0)


def test_sparse_nonuniform_ids(spark):
    # id gaps and skewed ranges must not affect the packing (parts are
    # id-range arithmetic, order is all that matters)
    ids = [1, 5, 6, 1000, 100000, 100001, 5_000_000]
    tokens = [10, 20, 30, 40, 50, 60, 70]
    df = spark.createDataFrame(
        list(zip(ids, tokens)), "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: r["pack_id"] for r in assign_pack_ids(df, budget=100).collect()}
    want = _reference(tokens, 100)
    assert [got[i] for i in ids] == want


def test_pack_sequences_concatenation_order(spark):
    from lse.packing import pack_sequences

    rows = [(i, f"doc{i}", 50) for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, content string, n_tokens long"
    )
    out = {
        r["pack_id"]: r
        for r in pack_sequences(df, budget=100, n_parts=3, sep="|").collect()
    }
    # 50-token docs, budget 100: packs of exactly 2 docs in id order
    assert len(out) == 5
    for p in range(5):
        r = out[p]
        assert r["n_docs"] == 2 and r["total_tokens"] == 100
        assert r["text"] == f"doc{2*p}|doc{2*p+1}"


def test_auto_parts_scales_with_rows():
    """Part width vs row count: 64-part floor for small inputs, then linear
    so one applyInPandas group can never exceed ~4M rows at any scale (the
    round-4 fixed default of 64 would put 1.6e10 rows in one group at
    10^12 rows)."""
    from lse.packing import _TARGET_ROWS_PER_PART, _auto_parts

    assert _auto_parts(0) == 64
    assert _auto_parts(100) == 64
    assert _auto_parts(64 * _TARGET_ROWS_PER_PART) == 64
    for n in (10**9, 10**10, 10**12):
        parts = _auto_parts(n)
        assert parts >= n // _TARGET_ROWS_PER_PART
        # rows per part bounded by the target (ceil division)
        assert -(-n // parts) <= _TARGET_ROWS_PER_PART


def test_auto_parts_same_result_as_fixed(spark):
    """n_parts=None must produce bit-identical pack ids to any explicit
    part count (the two-phase prefix sum is partition-invariant)."""
    from lse.packing import assign_pack_ids

    rows = [(i * 7 + 3, (i % 13) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    auto = {
        (r["doc_id"], r["pack_id"])
        for r in assign_pack_ids(df, budget=40).collect()
    }
    fixed = {
        (r["doc_id"], r["pack_id"])
        for r in assign_pack_ids(df, budget=40, n_parts=7).collect()
    }
    assert auto == fixed and len(auto) == 500
