#!/usr/bin/env python
"""Generate the golden-fixture parquet files for the non-SQL-expressible
operators (see lse/oracle_ops.py).

Each golden is computed by the independent driver-side replica — never by
the Spark implementation under test — and persisted under
``goldens/<sf>/<name>.parquet``. ``__spark_entry__.oracle_sql`` SELECTs
these back so the driver's DuckDB value-hash comparison binds the Spark
kernels; tests/test_golden_oracles.py re-derives them and fails if the
committed files are stale (e.g. after a testdata regeneration).

Usage: python scripts/make_goldens.py [sf0.01 sf0.001 ...]
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lse.oracle_ops import GOLDEN_OPS  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTDATA = "/root/testdata"


def main(sfs):
    for sf in sfs:
        src = os.path.join(TESTDATA, sf)
        docs = pd.read_parquet(os.path.join(src, "documents.parquet"))
        emb = pd.read_parquet(os.path.join(src, "embeddings.parquet"))
        out_dir = os.path.join(REPO, "goldens", sf)
        os.makedirs(out_dir, exist_ok=True)
        for name, (table, fn) in GOLDEN_OPS.items():
            golden = fn(docs if table == "documents" else emb)
            path = os.path.join(out_dir, f"{name}.parquet")
            golden.to_parquet(path, index=False)
            print(f"{sf}/{name}: {len(golden)} rows -> {path}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["sf0.01", "sf0.001"])
