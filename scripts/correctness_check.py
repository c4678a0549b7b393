"""Driver-replica correctness gate: run every ``__spark_entry__.queries()``
entry side-by-side with its ``oracle_sql()`` DuckDB equivalent at a given
scale factor and compare row count, schema (column-name set), and a
value hash over name-sorted columns / fully-sorted rows — the same shape
of check the round driver records in CORRECTNESS_r{N}.json.

Usage: python scripts/correctness_check.py [sf_dir] [name ...]
Defaults to /root/testdata/sf0.01 and all entries.
"""

import hashlib
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = {}
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype.kind == "f" or str(s.dtype).startswith("float"):
            out[c] = np.round(s.astype(np.float64), 6)
        elif s.dtype == object:
            out[c] = s.map(
                lambda v: json.dumps(v, sort_keys=True, default=str)
                if isinstance(v, (list, dict, np.ndarray))
                else v
            )
        else:
            out[c] = s
    pdf = pd.DataFrame(out)
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def _hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(pd.util.hash_pandas_object(pdf, index=False).values.tobytes())
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from lse.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    results, n_pass = {}, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"rows_match": False, "schema_match": False, "hash_match": False, "err": None}
        try:
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(odf)
            rec["rows_match"] = len(sdf) == len(odf)
            rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            if rec["rows_match"] and rec["schema_match"]:
                a, b = _norm(sdf), _norm(odf)
                try:
                    b = b.astype(a.dtypes.to_dict())
                except (TypeError, ValueError):
                    pass
                rec["hash_match"] = _hash(a) == _hash(_norm(b))
        except Exception as exc:  # noqa: BLE001 — gate reports, never aborts
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        rec["sec"] = round(time.time() - t0, 2)
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        n_pass += ok
        results[name] = rec
        print(("PASS" if ok else "FAIL"), name, rec["sec"], "s",
              "" if ok else {k: v for k, v in rec.items() if k != "sec"},
              flush=True)
    total = len(results)
    print(f"\n{n_pass}/{total} green")
    with open("/tmp/correctness_local.json", "w") as f:
        json.dump(results, f, indent=1)
    sys.exit(0 if n_pass == total else 1)


if __name__ == "__main__":
    main()
