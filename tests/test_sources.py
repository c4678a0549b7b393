"""File-tree source connector (S1 parity): a directory of files indexed
end-to-end — relative paths, extension → lang, binary/oversize skips,
mtime from the filesystem — matching the reference's FileCollector
semantics through a distributed binaryFile scan."""

import os

import pytest
from pyspark.sql import functions as F

from lse.build import build_index
from lse.engine import SearchEngine
from lse.sources import read_file_tree


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "proj"
    (root / "src" / "core").mkdir(parents=True)
    (root / "docs").mkdir()
    (root / "src" / "core" / "engine.py").write_text(
        "def searchengine_kernel():\n    return 'distributed treesource'\n"
    )
    (root / "src" / "core" / "util.java").write_text(
        "class Util { static int treesource = 42; }\n"
    )
    (root / "docs" / "readme.md").write_text(
        "# notes\ntreesource documentation line\n"
    )
    (root / "docs" / "noext").write_text("plain file without extension treesource")
    (root / "blob.bin").write_bytes(b"\x00\x01\x02binarystuff" * 10)
    (root / "huge.txt").write_text("x" * 1000)
    return str(root)


def test_tree_scan_shape_and_filters(spark, tree):
    df = read_file_tree(spark, tree)
    rows = {r["path"]: r for r in df.collect()}
    assert set(rows) == {
        "src/core/engine.py", "src/core/util.java", "docs/readme.md",
        "docs/noext", "huge.txt",
    }  # blob.bin skipped (NUL head)
    assert rows["src/core/engine.py"]["lang"] == "py"
    assert rows["src/core/util.java"]["lang"] == "java"
    assert rows["docs/noext"]["lang"] == ""
    assert rows["docs/readme.md"]["repo"] == "proj"
    assert rows["docs/readme.md"]["mtime"] is not None
    assert "treesource documentation" in rows["docs/readme.md"]["content"]


def test_tree_size_cap_and_glob(spark, tree):
    small = read_file_tree(spark, tree, max_bytes=500)
    assert "huge.txt" not in {r["path"] for r in small.collect()}
    only_py = read_file_tree(spark, tree, path_glob="*.py")
    assert {r["path"] for r in only_py.collect()} == {"src/core/engine.py"}


def test_tree_indexes_and_queries(spark, tree, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, read_file_tree(spark, tree), idx,
                n_buckets=2, index_partitions=2)
    eng = SearchEngine(spark, idx)
    hits, total = eng.search_result("treesource", 10)
    assert total == 4
    # field filters work off tree metadata
    _h, t_py = eng.search_result("ext:py AND treesource", 10)
    assert t_py == 1
    _h, t_path = eng.search_result("path:docs AND treesource", 10)
    assert t_path == 2
    # filename rewrite on a real file name
    _h, t_name = eng.search_result("readme.md", 10)
    assert t_name == 1


def test_tree_dir_with_space_and_percent(spark, tmp_path):
    root = tmp_path / "has space%dir"
    root.mkdir()
    (root / "a.txt").write_text("space percent treesource")
    df = read_file_tree(spark, str(root))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["path"] == "a.txt"
