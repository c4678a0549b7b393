"""Source connectors: filesystem trees → the input_hint table shape.

The reference's S1 stage walks a directory tree, filters binaries/oversize
files, and reads text content (core FileCollector semantics). The
Spark-native equivalent is a distributed ``binaryFile`` scan — executors
read the files, nothing streams through the driver — mapped onto the
(repo, path, commit, lang, content) shape every downstream stage consumes.

Filters mirror the reference's collection guards:
* ``max_bytes``     — oversize files are skipped (size cap);
* ``text_only``     — files whose head contains a NUL byte are skipped
                      (binary detection; decoded text replaces any invalid
                      UTF-8 sequences rather than failing the scan);
* ``path_glob``     — e.g. ``*.py`` (Hadoop pathGlobFilter, pushed to the
                      file listing, no data read for filtered files).

``mtime`` comes from the file's modification time and ``lang`` from the
extension, so metadata queries (size:/mtime:/ext:) work identically to a
parquet-sourced index.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_file_tree(
    spark: SparkSession,
    root: str,
    path_glob: Optional[str] = None,
    max_bytes: int = 10 << 20,
    text_only: bool = True,
    repo: Optional[str] = None,
    commit: str = "",
) -> DataFrame:
    """Distributed file-tree scan → (repo, path, commit, lang, content,
    mtime) rows ready for ``build_index``.

    ``path`` is relative to ``root`` (forward slashes); ``repo`` defaults
    to the root directory's basename."""
    root = os.path.abspath(root)
    reader = (
        spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    df = reader.load(root)
    repo_name = repo if repo is not None else (os.path.basename(root) or root)
    # binaryFile's `path` is a file: URI (raw, not %-encoded — see
    # build._norm_file); strip the scheme and the root prefix
    rel = F.regexp_replace(
        F.regexp_replace(F.col("path"), "^file:/*", "/"),
        "^" + re.escape(root + "/"),
        "",
    )
    # extension from the BASENAME only: a dot in a directory name must not
    # leak into it ('v1.2/README' has no extension), so match a final
    # dot-delimited run containing neither '/' nor '.'
    ext = F.lower(F.regexp_extract(rel, r"\.([^/.]+)$", 1))
    df = df.filter(F.col("length") <= max_bytes)
    if text_only:
        # NUL byte in the first 8 KB => almost certainly binary -- skip,
        # exactly like the reference's collection-time binary filter.
        # Checked on the RAW bytes via hex with even-position alignment
        # (a bare substring match on "00" would false-positive across
        # byte boundaries, e.g. 0x30 0x02 -> "3002").
        head_hex = F.hex(F.substring(F.col("content"), 1, 8192))
        df = df.filter(~head_hex.rlike("^(..)*?00"))
    return df.select(
        F.lit(repo_name).alias("repo"),
        rel.alias("path"),
        F.lit(commit).alias("commit"),
        ext.alias("lang"),  # "" when the basename has no extension
        F.decode(F.col("content"), "UTF-8").alias("content"),
        F.col("modificationTime").alias("mtime"),
    )
