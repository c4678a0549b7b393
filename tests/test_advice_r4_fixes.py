"""Regression tests for the round-3 ADVICE findings (VERDICT r3 inputs).

1. build.py encode distribution — hot-term buckets must stay split across
   tasks even in the sort-merge-join regime (df_global too big to
   broadcast): parity build with broadcast joins disabled.
2. local_exec.can_execute — a metadata-backed sort (sort:mtime/sort:size)
   must pass the meta_limit gate; the AST alone never reveals it.
3. wav decode — sample_rate=0 in the fmt chunk must raise ValueError (the
   per-row loud-skip contract), not ZeroDivisionError in audio_features.
4. sources.read_file_tree — extension comes from the basename only; a dot
   in a directory name must not corrupt it.
5. maintenance compact swap — recover_index_dir rolls back a crash between
   the two renames.
"""

import os
import shutil
import struct

import pytest


# ------------------------------------------------------------ 1. build SMJ
def test_encode_distribution_parity_without_broadcast(spark, tmp_path):
    """Force the df_global join into its sort-merge regime and pin query
    parity: the explicit repartition(term, bucket) guard must not change
    any result, and the build must still produce multiple buckets for a
    hot term (the skew split the ADVICE finding is about)."""
    from lse.build import build_index
    from lse.engine import SearchEngine
    from lse.fixtures import make_repos_df
    from lse.oracle import OracleIndex

    source = make_repos_df(spark, n_docs=120, partitions=4)
    idx = str(tmp_path / "idx_smj")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # broadcast_vocab_limit=0 forces the big-vocab path: SMJ df join +
        # explicit repartition(term, bucket) before the encode groupBy
        build_index(
            spark, source, idx, n_buckets=4, index_partitions=4,
            broadcast_vocab_limit=0,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    eng = SearchEngine(spark, idx)
    docs_pdf = spark.read.parquet(os.path.join(idx, "docs")).toPandas()
    oracle = OracleIndex(docs_pdf)
    for q in ["spark", "java OR python", '"distributed system"', "NOT spark"]:
        hits, total = eng.search_result(q, limit=10)
        ohits, ototal = oracle.search(q, limit=10)
        assert total == ototal, q
        assert [h[0] for h in hits] == [h[0] for h in ohits], q
        for (_, s), (_, so) in zip(hits, ohits):
            assert abs(s - so) < 1e-9, q
    # a frequent term must span >1 bucket shard — the split the explicit
    # repartition preserves in the SMJ regime
    post = spark.read.parquet(os.path.join(idx, "postings"))
    from pyspark.sql import functions as F

    nb = (
        post.groupBy("term")
        .agg(F.countDistinct("bucket").alias("nb"))
        .agg(F.max("nb").alias("m"))
        .first()["m"]
    )
    assert nb > 1


# ------------------------------------------------------- 2. sort meta gate
def test_can_execute_gates_metadata_sort(spark, fixture_index):
    from lse import querydsl
    from lse.engine import SearchEngine

    index_dir, docs_pdf = fixture_index
    eng = SearchEngine(spark, index_dir)
    res = querydsl.parse("spark sort:size")
    assert eng.local.can_execute(res.ast, res.sort)  # small corpus: fine
    eng.local.meta_limit = 10  # corpus is 150 docs > 10
    assert not eng.local.can_execute(res.ast, res.sort)
    # same AST without the sort stays admissible (postings budget permitting)
    assert eng.local.can_execute(res.ast, None)
    # and the public route still serves it correctly via the other tiers
    hits, total = eng.search_result("spark sort:size", limit=5)
    assert total > 0 and len(hits) <= 5


# ----------------------------------------------------------- 3. wav rate=0
def _wav_bytes(rate: int, channels: int = 1, n: int = 8) -> bytes:
    body = struct.pack("<HHIIHH", 1, channels, rate, rate * 2, 2, 16)
    data = struct.pack(f"<{n}h", *([0] * n))
    chunks = b"fmt " + struct.pack("<I", len(body)) + body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_rejects_zero_rate():
    from lse.wav import decode_wav, probe_wav

    with pytest.raises(ValueError):
        decode_wav(_wav_bytes(rate=0))
    with pytest.raises(ValueError):
        probe_wav(_wav_bytes(rate=0))
    samples, rate = decode_wav(_wav_bytes(rate=8000))
    assert rate == 8000 and samples.shape == (8, 1)


def test_audio_features_quarantines_zero_rate(spark):
    """One malformed WAV must not fail the whole task — audio_features'
    real backend surfaces ValueError rows via its loud-skip contract."""
    from lse.multimodal import audio_features

    good = _wav_bytes(rate=8000)
    df = spark.createDataFrame([(1, bytearray(good))], "id long, payload binary")
    out = audio_features(df, backend="real").collect()
    assert len(out) == 1 and out[0]["sample_rate"] == 8000
    bad = spark.createDataFrame(
        [(2, bytearray(_wav_bytes(rate=0)))], "id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        audio_features(bad, backend="real").collect()
    assert "ZeroDivisionError" not in str(ei.value)


# ------------------------------------------------------ 4. dotted-dir exts
def test_file_tree_extension_from_basename(spark, tmp_path):
    from lse.sources import read_file_tree

    root = tmp_path / "tree"
    (root / "v1.2").mkdir(parents=True)
    (root / "v1.2" / "README").write_text("readme body text")
    (root / "v1.2" / "mod.py").write_text("print('x')")
    (root / "plain.txt").write_text("plain text")
    rows = {
        r["path"]: r["lang"]
        for r in read_file_tree(spark, str(root)).collect()
    }
    assert rows["v1.2/README"] == ""  # dotted dir must not leak an ext
    assert rows["v1.2/mod.py"] == "py"
    assert rows["plain.txt"] == "txt"


# -------------------------------------------------- 5. compact swap crash
def test_recover_index_dir_rolls_back_half_swap(tmp_path):
    from lse.maintenance import recover_index_dir

    base = str(tmp_path / "index")
    # healthy: stale leftovers are cleaned
    os.makedirs(base)
    os.makedirs(base + ".old")
    os.makedirs(base + ".compacting")
    assert recover_index_dir(base) == "ok"
    assert os.path.isdir(base)
    assert not os.path.isdir(base + ".old")
    assert not os.path.isdir(base + ".compacting")
    # crashed between the two renames: index_dir gone, .old complete
    os.rename(base, base + ".old")
    with open(base + ".old/marker", "w") as f:
        f.write("pre-compaction")
    assert recover_index_dir(base) == "restored_old"
    assert os.path.isdir(base) and os.path.exists(base + "/marker")
    # nothing at all
    shutil.rmtree(base)
    assert recover_index_dir(base) == "missing"


def test_engine_load_recovers_half_swap(spark, fixture_index, tmp_path):
    """A SearchEngine opened mid-crash-window must transparently restore
    the pre-compaction snapshot and serve it."""
    from lse.engine import SearchEngine

    index_dir, _ = fixture_index
    victim = str(tmp_path / "index")
    shutil.copytree(index_dir, victim + ".old")  # crash left only .old
    eng = SearchEngine(spark, victim)
    hits, total = eng.search_result("spark", limit=5)
    assert total > 0
