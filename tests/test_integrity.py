"""Index-file integrity: per-file sha256 lineage in the manifest must detect
bit-flips and missing files on load — the Spark-native analog of the
reference's CRC32 footers (storage/StorageFileUtil.java:86-114, corruption
test storage/StorageRoundTripTest.java:161-177)."""

import glob
import os

from lse.build import build_index, verify_index
from lse.fixtures import make_repos_df


def test_manifest_sha_detects_corruption(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, make_repos_df(spark, n_docs=60, partitions=2), d,
                n_buckets=2, index_partitions=2)
    man = spark.read.parquet(os.path.join(d, "manifest")).collect()
    assert all(r["file_sha256"] for r in man)

    assert verify_index(spark, d) == []

    # flip one byte mid-file
    victim = sorted(glob.glob(os.path.join(d, "postings", "*.parquet")))[0]
    data = bytearray(open(victim, "rb").read())
    data[len(data) // 2] ^= 0xFF
    open(victim, "wb").write(bytes(data))
    spark.catalog.clearCache()

    problems = verify_index(spark, d)
    assert len(problems) == 1
    assert problems[0]["problem"] == "corrupted"
    assert problems[0]["file"].endswith(os.path.basename(victim))

    # a deleted file is reported as missing
    os.remove(victim)
    problems = verify_index(spark, d)
    assert {p["problem"] for p in problems} == {"missing"}


def test_verify_survives_index_rename(spark, tmp_path):
    """Manifests record build-time paths; a moved/renamed index (compaction
    swap, operator rsync) must still verify clean — comparison is by
    stage-relative name, hashing at the current location."""
    import os

    from lse.build import build_index, verify_index
    from lse.fixtures import make_repos_df

    a = str(tmp_path / "idx_a")
    build_index(spark, make_repos_df(spark, 30, partitions=2), a,
                n_buckets=2, index_partitions=2)
    b = str(tmp_path / "idx_moved")
    os.rename(a, b)
    assert verify_index(spark, b) == []
    # corruption is still detected at the new location
    import glob

    victim = sorted(glob.glob(os.path.join(b, "postings", "*.parquet")))[0]
    raw = open(victim, "rb").read()
    open(victim, "wb").write(raw[:-4] + b"XXXX")
    problems = verify_index(spark, b)
    assert [p["problem"] for p in problems] == ["corrupted"]
