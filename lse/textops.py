"""Text-analysis operators for corpus curation — all JVM-side column
expressions (whole-stage codegen) except the rolling-hash fingerprint, which
is Arrow-batched numpy.

* add_language_id   — n-gram/character heuristic language tag
* add_quality       — length / punctuation / stopword-ratio quality score
* add_token_counts  — whitespace tokens + a BPE-ish regex token estimate
* fingerprints      — winnowing-style rolling-hash document fingerprints
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import STOPWORDS

_CJK_CLASS = r"[一-鿿㐀-䶿぀-ヿ가-힯]"
# BPE-ish pattern (GPT-2 style): contractions, letter runs, digit runs,
# punctuation runs, whitespace-prefixed words
_BPE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"


def add_language_id(df: DataFrame, col: str = "content", out: str = "lang_id") -> DataFrame:
    """Deterministic heuristic: CJK char ratio → 'cjk'; else stopword-hit
    count over the first 2000 chars → 'en' / 'unknown'."""
    head = F.substring(F.col(col), 1, 2000)
    n_chars = F.greatest(F.length(head), F.lit(1))
    cjk = F.length(F.regexp_replace(head, f"[^{_CJK_CLASS[1:-1]}]", ""))
    words = F.filter(
        F.split(F.lower(head), r"[^a-z]+"), lambda w: w.isin(*sorted(STOPWORDS))
    )
    return df.withColumn(
        out,
        F.when(cjk / n_chars > 0.10, F.lit("cjk"))
        .when(F.size(words) >= 3, F.lit("en"))
        .otherwise(F.lit("unknown")),
    )


def add_quality(df: DataFrame, col: str = "content", out: str = "quality") -> DataFrame:
    """Quality score in [0,1]: favors moderate length, low punctuation
    density, a natural stopword ratio, and word-like mean token length."""
    text = F.col(col)
    n = F.greatest(F.length(text), F.lit(1)).cast("double")
    words = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    n_words = F.greatest(F.size(words), F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(text, r"[\w\s]", "")).cast("double")
    stops = F.size(F.filter(words, lambda w: w.isin(*sorted(STOPWORDS)))).cast("double")
    mean_wl = n / n_words
    len_score = F.least(n / 200.0, F.lit(1.0)) * F.least(F.lit(1.0), 50000.0 / n)
    punct_score = F.greatest(F.lit(0.0), 1.0 - 4.0 * (punct / n))
    stop_ratio = stops / n_words
    stop_score = F.when((stop_ratio > 0.05) & (stop_ratio < 0.6), 1.0).otherwise(0.5)
    wl_score = F.when((mean_wl > 3.0) & (mean_wl < 12.0), 1.0).otherwise(0.6)
    return df.withColumn(
        out, F.round(len_score * punct_score * stop_score * wl_score, 6)
    )


def add_token_counts(df: DataFrame, col: str = "content") -> DataFrame:
    """whitespace_tokens + bpe_tokens_est columns (both codegen regex)."""
    ws = F.size(F.filter(F.split(F.col(col), r"\s+"), lambda w: w != ""))
    bpe = F.size(F.regexp_extract_all(F.col(col), F.lit(_BPE_RE), 0))
    return df.withColumn("whitespace_tokens", ws).withColumn(
        "bpe_tokens_est", bpe
    )


_FP_PRIME = np.uint64(1099511628211)  # FNV-64 prime as the rolling base


_FP_PRIME_INV = np.uint64(pow(int(_FP_PRIME), -1, 1 << 64))  # p odd ⇒ invertible


def _kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """Vectorized polynomial k-gram hashes over the BYTE stream:
    ``h_i = Σ_j data[i+j] · p^(k-1-j)  (mod 2^64)``.

    True O(n) rolling form (not the O(n·k) window matrix product): with
    prefix sums ``C[t] = Σ_{s<t} data[s]·p^(-s)`` the window sum telescopes
    to ``h_i = (C[i+k] − C[i]) · p^(i+k-1)`` — three cumulated passes over
    uint64 (whose wraparound IS arithmetic mod 2^64, and p is odd so p⁻¹
    exists). Values are bit-identical to the window-product form."""
    b = np.frombuffer(data, dtype=np.uint8)
    if b.size < k:
        # short text: hash the whole string once (same degenerate case the
        # per-gram form would produce for its only gram)
        powers = _FP_PRIME ** np.arange(b.size - 1, -1, -1, dtype=np.uint64)
        return np.array([(b.astype(np.uint64) * powers).sum()], dtype=np.uint64)
    n = b.size
    m = n - k + 1
    pw_inv = np.full(n, _FP_PRIME_INV, dtype=np.uint64)
    pw_inv[0] = 1
    np.cumprod(pw_inv, out=pw_inv)  # p^(-t), t = 0..n-1 (mod 2^64)
    csum = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(b.astype(np.uint64) * pw_inv, out=csum[1:])
    pw = np.full(m, _FP_PRIME, dtype=np.uint64)
    pw[0] = np.uint64(pow(int(_FP_PRIME), k - 1, 1 << 64))
    np.cumprod(pw, out=pw)  # p^(i+k-1), i = 0..m-1
    return (csum[k:] - csum[:m]) * pw


def fingerprints(
    df: DataFrame,
    col: str = "content",
    k: int = 8,
    window: int = 16,
) -> DataFrame:
    """Winnowing fingerprints: polynomial rolling hash over k-byte grams,
    minimum per sliding window, distinct mins kept →
    (doc_id, fingerprints array<long>). Standard winnowing (Schleimer et
    al., SIGMOD'03); the whole kernel — gram hashing included — is bulk
    numpy, no per-character Python."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("fingerprints", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out_id, out_fp = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[col]):
                hs = _kgram_hashes((text or "").lower().encode("utf-8"), k)
                if hs.size <= window:
                    mins = np.array([hs.min()], dtype=np.uint64)
                else:
                    sw = np.lib.stride_tricks.sliding_window_view(hs, window)
                    mins = sw.min(axis=1)
                out_id.append(doc_id)
                out_fp.append(np.unique(mins).view(np.int64).tolist())
            yield pd.DataFrame({"doc_id": out_id, "fingerprints": out_fp})

    return df.select("doc_id", col).mapInPandas(run, schema)


# --------------------------------------------------- dataset curation ops
def add_split(
    df: DataFrame, col: str = "content", train_pct: int = 90, out: str = "split"
) -> DataFrame:
    """Deterministic content-hash train/val split — the standard
    leakage-safe dataset partitioner: the assignment is a pure function of
    the CONTENT (md5 first 8 hex digits mod 100), so exact duplicates land
    in the same side regardless of row order, partitioning, or re-runs, and
    no RNG state needs coordinating across 1000 executors. Pure JVM column
    expressions (whole-stage codegen)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long") % 100
    )
    return df.withColumn(
        out, F.when(bucket < train_pct, F.lit("train")).otherwise(F.lit("val"))
    ).withColumn(out + "_bucket", bucket.cast("int"))


# (pattern, replacement) — conservative common-subset regexes that parse
# identically under Java regex (Spark) and RE2 (DuckDB/ripgrep): no
# backrefs, no lookaround
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{9,16}\b", "<NUMBER>"),
]


def redact_pii(
    df: DataFrame, col: str = "content", out: str = "redacted"
) -> DataFrame:
    """Replace emails / IPv4 addresses / long digit runs (SSN, phone,
    account numbers) with typed placeholder tokens — the training-data
    scrubbing pass. Chained JVM regexp_replace, no Python in the hot
    path; order matters (emails first, so their digits never half-match
    the number pattern)."""
    expr = F.col(col)
    for pat, repl in PII_PATTERNS:
        expr = F.regexp_replace(expr, pat, repl)
    return df.withColumn(out, expr)


def ngram_counts(
    df: DataFrame, col: str = "content", n: int = 2, min_count: int = 1
) -> DataFrame:
    """(ngram, n_count) — corpus-wide token n-gram frequency table WITH
    multiplicity (the LM-training statistic, unlike dedup's distinct
    shingle sets). Pure JVM split/transform/explode + one hash-agg
    shuffle keyed by the n-gram itself (content-derived, uniform — no
    skew); at 100 TB this is the canonical count-table job."""
    toks = F.split(F.lower(F.col(col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda t: F.length(t) > 1)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (
        df.select(F.explode(grams).alias("ngram"))
        .filter(F.col("ngram") != "")
        .groupBy("ngram")
        .agg(F.count("*").alias("n_count"))
        .filter(F.col("n_count") >= min_count)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict,
    strata_col: str = "lang",
    col: str = "content",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the corpus-mixing primitive
    (downsample over-represented languages/qualities, keep rare strata at
    1.0) for assembling a training mix.

    ``rates`` maps stratum value -> keep fraction in [0, 1]. A row is kept
    iff md5(content) mod 10000 < rate·10000, so the decision is a pure
    function of the CONTENT (same scheme as :func:`add_split`): exact
    duplicates sample identically, re-runs are reproducible with no RNG
    state coordinated across executors, and composing with the content-hash
    train/val split stays leakage-safe. The rate table ships as a literal
    `create_map` — a whole-stage-codegen expression, not even a broadcast
    join, so the corpus-sized side never shuffles."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long") % 10000
    )
    pairs = []
    for k, v in rates.items():
        pairs += [F.lit(k), F.lit(int(round(float(v) * 10000)))]
    bps = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)] if pairs else F.lit(None).cast("int"),
        F.lit(int(round(float(default_rate) * 10000))),
    )
    return df.filter(bucket < bps)
