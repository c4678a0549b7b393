"""Deterministic synthetic source-code corpus (seed=42).

Generates the exact input_hint table shape — (repo, path, commit, lang,
content) — with planted patterns so every reference query class has known
answers (FIXTURES.md F1; mirrors the mini-corpora of the reference's
QueryEngineTest.java:28-262). No external data; pure-Python RNG so the corpus
is bit-identical across runs and parallelism levels.
"""

from __future__ import annotations

import hashlib
import random
from typing import List, Optional

import pandas as pd

VOCAB = [
    "java", "python", "spark", "query", "index", "search", "engine", "token",
    "parser", "lexer", "score", "merge", "segment", "posting", "document",
    "build", "shuffle", "partition", "filter", "column", "table", "batch",
    "stream", "window", "join", "sort", "hash", "range", "error", "timeout",
    "retry", "commit", "branch", "clone", "thread", "worker", "queue",
    "buffer", "cache", "disk", "memory", "vector", "matrix", "tensor",
    "kernel", "driver", "executor", "cluster", "node", "edge", "graph",
    "tree", "heap", "stack", "list", "array", "string", "number", "value",
    "return", "public", "static", "void", "class", "import", "package",
]

STOPWORD_SPRINKLE = [
    "the", "is", "and", "a", "of", "to", "in", "for", "on", "with",
]

PLANTED = [
    "java programming guide",
    "python programming tutorial",
    "java tutorial java java",
    "distributed system architecture notes",
    "system distributed design review",
    "configuration management configure deploy",
    "error timeout retry handler",
    "error handling draft internal memo",
    "machine learning model training",
    "learning machine pipeline",
    "java programming reference machine learning overview",
]

LANGS = ["java", "py", "md", "txt"]


def make_repos_pdf(n_docs: int = 500, seed: int = 42) -> pd.DataFrame:
    """Pandas frame of the input_hint shape + deterministic mtime."""
    rng = random.Random(seed)
    rows: List[dict] = []
    for i in range(n_docs):
        repo = f"org{i % 7}/repo{i % 23}"
        lang = LANGS[i % len(LANGS)]
        directory = ["core", "util", "api", "cli", "test"][i % 5]
        name = f"file{i:05d}"
        # a handful of well-known filenames for filename-query tests
        if i % 97 == 0:
            name = "readme"
            lang = "md"
        path = f"src/{directory}/{name}.{lang}"
        commit = hashlib.sha1(f"{repo}@{seed}".encode()).hexdigest()[:12]
        n_words = rng.randint(20, 120)
        words = [VOCAB[rng.randrange(len(VOCAB))] for _ in range(n_words)]
        # sprinkle stopwords everywhere (df-skew terms for salting tests)
        for j in range(0, n_words, 4):
            words.insert(j, STOPWORD_SPRINKLE[rng.randrange(len(STOPWORD_SPRINKLE))])
        content = " ".join(words)
        if i % 11 == 0:
            content = PLANTED[(i // 11) % len(PLANTED)] + " " + content
        # tf-graded docs for score-ordering tests
        if i % 13 == 0:
            content = "java java java " + content
        # occasional punctuation runs / single-char tokens (tokenizer edges)
        if i % 29 == 0:
            content += " x y z !!! ,,, a-1 b_2"
        # rare CJK lines for composite-tokenizer parity
        if i % 101 == 0:
            content += " 搜索引擎 Hello 世界"
        mtime = pd.Timestamp("2025-01-01T00:00:00Z") + pd.Timedelta(
            hours=(i * 7) % (24 * 365)
        )
        rows.append(
            dict(repo=repo, path=path, commit=commit, lang=lang,
                 content=content, mtime=mtime)
        )
    return pd.DataFrame(rows)


def make_repos_df(spark, n_docs: int = 500, seed: int = 42, partitions: Optional[int] = None):
    """Spark DataFrame of the synthetic corpus."""
    pdf = make_repos_pdf(n_docs, seed)
    df = spark.createDataFrame(pdf)
    if partitions:
        df = df.repartition(partitions)
    return df


def make_skewed_df(
    spark,
    n_docs: int,
    partitions: int = 32,
    spike_every: int = 997,
    spike_tf: int = 40,
    rare_every: int = 2000,
):
    """Score-SKEWED corpus for block-max pruning benchmarks — the regime the
    reference's skip lists exist for (storage/PostingsWriter.java:48-60) and
    the synthetic uniform corpus cannot produce.

    Structure (all deterministic functions of doc_id; generated distributed
    via spark.range — nothing materializes on the driver):

    * ``hot``  — in EVERY doc with tf=1, except a tf spike (``spike_tf``)
      every ``spike_every`` docs: idf ≈ 0, per-block bounds near-uniform
      except the ~1/8 of 128-doc blocks holding a spike;
    * ``rare`` — every ``rare_every``-th doc with tf=3: high idf, few wide
      blocks — top-k is dominated by these docs, setting a θ most hot
      blocks cannot beat (the rare-OR-hot WAND win regime);
    * ``rare2`` — a second rare term (every ``4·rare_every`` docs) for
      multi-rare OR shapes that stay in the WAND win regime;
    * ``warm1``/``warm2`` — mid-df terms for wider OR shapes (these pull a
      query OUT of the win regime: fat companion lists);
    * per-doc filler/pad tokens vary dl (BM25 length normalization).

    doc_ids are dense 0..n-1, so 128-doc blocks are contiguous id ranges
    and the spike structure maps directly onto block bounds."""
    from pyspark.sql import functions as F

    base = spark.range(0, n_docs, 1, partitions)
    i = F.col("id")
    tf_hot = F.when(i % spike_every == 0, spike_tf).otherwise(1)
    parts = [
        F.array_join(F.array_repeat(F.lit("hot"), tf_hot.cast("int")), " "),
        F.when(i % rare_every == 7, F.lit("rare rare rare")).otherwise(F.lit("")),
        F.when(i % (4 * rare_every) == 13, F.lit("rare2 rare2")).otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit("warm1")).otherwise(F.lit("")),
        F.when(i % 13 == 0, F.lit("warm2 warm2")).otherwise(F.lit("")),
        F.concat(F.lit("fill"), (i % 53).cast("string")),
        F.array_join(
            F.array_repeat(
                F.concat(F.lit("pad"), (i % 17).cast("string")),
                (i % 7 + 1).cast("int"),
            ),
            " ",
        ),
    ]
    return base.select(
        i.alias("doc_id"),
        F.concat(F.lit("skew/repo"), (i % 5).cast("string")).alias("repo"),
        F.concat(F.lit("f"), i.cast("string"), F.lit(".txt")).alias("path"),
        F.lit("").alias("commit"),
        F.lit("txt").alias("lang"),
        F.concat_ws(" ", *parts).alias("content"),
    )
