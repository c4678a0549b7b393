"""S13 smoke: the JSON result sink (CLI `search --json`) emits one valid
JSON document whose hits match the library's search_result — the last §2
row without any test trace (VERDICT r2 #7)."""

import importlib.util
import json
import os
import sys

import pytest


def _run_cli(argv, capsys):
    spec = importlib.util.spec_from_file_location(
        "lse_cli", os.path.join(os.path.dirname(__file__), "..", "scripts", "lse_cli.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["lse"] + argv
    try:
        rc = mod.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    return rc, out


def test_search_json_sink(spark, fixture_index, capsys, monkeypatch):
    # the CLI stops its session on exit; keep the shared test session alive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    index_dir, _ = fixture_index
    rc, out = _run_cli(
        ["search", "--index", index_dir, "--query", "java AND programming",
         "--limit", "5", "--json"],
        capsys,
    )
    assert rc in (0, None)
    doc = json.loads(out.strip().splitlines()[-1])
    assert doc["query"] == "java AND programming"
    assert isinstance(doc["total_matches"], int)
    assert len(doc["hits"]) <= 5
    from lse.engine import SearchEngine

    hits, total = SearchEngine(spark, index_dir).search_result(
        "java AND programming", 5
    )
    assert doc["total_matches"] == total
    assert [h["doc_id"] for h in doc["hits"]] == [d for d, _ in hits]
    for h, (_, s) in zip(doc["hits"], hits):
        assert h["score"] == pytest.approx(s, abs=1e-9)


def test_search_json_parse_error_exit_code(spark, fixture_index, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    index_dir, _ = fixture_index
    rc, _ = _run_cli(
        ["search", "--index", index_dir, "--query", '"unclosed', "--json"],
        capsys,
    )
    assert rc == 2


def test_cli_stream_ingest(spark, tmp_path, capsys, monkeypatch):
    """`lse stream` drains a parquet arrival dir into an index whose
    queries match the library path."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    from lse.fixtures import make_repos_df

    src = make_repos_df(spark, n_docs=40, partitions=1).select(
        "repo", "path", "commit", "lang", "content"
    )
    arrivals = str(tmp_path / "arrivals")
    src.coalesce(1).write.parquet(arrivals)
    idx = str(tmp_path / "idx")
    rc, out = _run_cli(
        ["stream", "--source", arrivals, "--index", idx,
         "--checkpoint", str(tmp_path / "ck"),
         "--buckets", "2", "--partitions", "2"],
        capsys,
    )
    assert rc in (0, None)
    assert json.loads(out.strip().splitlines()[-1])["streamed"] is True
    from lse.engine import SearchEngine

    hits, total = SearchEngine(spark, idx).search_result("java", 10)
    assert total > 0


def test_cli_compact(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    from lse.build import build_index
    from lse.fixtures import make_repos_df
    from lse.streaming import upsert_batch

    idx = str(tmp_path / "idx")
    base = make_repos_df(spark, n_docs=30, partitions=1).select(
        "repo", "path", "commit", "lang", "content"
    )
    build_index(spark, base, idx, n_buckets=2, index_partitions=2)
    upsert_batch(spark, idx, spark.createDataFrame(
        [("r", "x.py", "c", "py", "cli compact smoke doc")],
        "repo string, path string, commit string, lang string, content string"))
    rc, out = _run_cli(["compact", "--index", idx], capsys)
    assert rc in (0, None)
    doc = json.loads(out.strip().splitlines()[-1])
    assert doc["compacted"] and doc["segments_merged"] == 2
    from lse.engine import SearchEngine

    eng = SearchEngine(spark, idx)
    assert not eng.multi_segment
    _h, total = eng.search_result("smoke", 5)
    assert total == 1
