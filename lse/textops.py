"""Text-analysis operators for corpus curation — all JVM-side column
expressions (whole-stage codegen) except the rolling-hash fingerprint, which
is Arrow-batched numpy.

* add_language_id   — n-gram/character heuristic language tag
* add_quality       — length / punctuation / stopword-ratio quality score
* add_token_counts  — whitespace tokens + a BPE-ish regex token estimate
* fingerprints      — winnowing-style rolling-hash document fingerprints
* tfidf_keywords    — per-doc top-k smoothed tf-idf keywords
* unigram_logprob   — corpus-self unigram LM mean log-prob (perplexity proxy)
* repetition_stats  — Gopher-style duplicate-line / top-word repetition signals
* decontaminate     — benchmark n-gram overlap flagging (eval-leak filter)
"""

from __future__ import annotations

from typing import Iterable, Optional

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


def _token_ngrams(col: str, n: int):
    """Array of space-joined token n-grams over the shared curation token
    definition (lowercase alnum runs, length > 1) — a pure codegen
    higher-order-function expression."""
    toks = F.split(F.lower(F.col(col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda t: F.length(t) > 1)
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))


def ngram_counts(
    df: DataFrame, col: str = "content", n: int = 2, min_count: int = 1
) -> DataFrame:
    """(ngram, n_count) — corpus-wide token n-gram frequency table WITH
    multiplicity (the LM-training statistic, unlike dedup's distinct
    shingle sets). Pure JVM split/transform/explode + one hash-agg
    shuffle keyed by the n-gram itself (content-derived, uniform — no
    skew); at 100 TB this is the canonical count-table job."""
    return (
        df.select(F.explode(_token_ngrams(col, n)).alias("ngram"))
        .filter(F.col("ngram") != "")
        .groupBy("ngram")
        .agg(F.count("*").alias("n_count"))
        .filter(F.col("n_count") >= min_count)
    )


def _word_tokens(col: str):
    """The curation-op token definition (shared with :func:`ngram_counts` and
    its DuckDB transcription): lowercase split on non-alphanumeric runs,
    keep tokens of length > 1."""
    toks = F.split(F.lower(F.col(col)), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: F.length(t) > 1)


def term_frequencies(
    df: DataFrame, col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) — the shared building block of the corpus
    statistics below. Both :func:`tfidf_keywords` and
    :func:`unigram_logprob` need this stream more than once (per-doc tf AND
    a term-keyed rollup); Spark lineage recompute means each use re-scans
    the source, so at scale compute it ONCE, ``persist(DISK_ONLY)`` or
    write it to parquet, and pass it via the ``tf=`` parameter — one
    tokenization pass instead of two or three."""
    t = df.select(
        F.col(id_col).alias("doc_id"), F.explode(_word_tokens(col)).alias("term")
    ).filter(F.col("term") != "")
    return t.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def tfidf_keywords(
    df: DataFrame,
    col: str = "content",
    k: int = 5,
    id_col: str = "doc_id",
    tf: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document top-k keywords by smoothed tf-idf
    (``tf · (ln((N+1)/(df+1)) + 1)``, the sklearn-style smooth idf) —
    the classic extractive keyword/topic signal for corpus exploration
    and mixing decisions.

    Scale shape: one explode + hash-agg to (doc, term, tf) — shuffle keyed
    by content-derived uniform keys; the document-frequency table is a
    second hash-agg over the SAME (doc,term)-distinct stream (map-side
    partials absorb hot terms); N ships as a broadcast scalar; the df join
    is term-keyed (broadcastable at moderate vocab, SMJ beyond); the top-k
    window partitions by doc (uniform, bounded by doc length). Everything
    is JVM whole-stage codegen — no Python in the plan. Ties break on term
    ascending so ranks are deterministic across engines and runs. Pass a
    persisted ``tf`` (see :func:`term_frequencies`) to avoid the double
    source scan lineage recompute otherwise costs."""
    from pyspark.sql import Window

    if tf is None:
        tf = term_frequencies(df, col=col, id_col=id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= k)
        .select(
            "doc_id", "kw_rank", "term", "tf", "df",
            F.round("tfidf", 6).alias("tfidf"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    col: str = "content",
    id_col: str = "doc_id",
    tf: Optional[DataFrame] = None,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's OWN
    unigram model — the CCNet/KenLM-style perplexity proxy: boilerplate and
    natural prose score high, random identifiers / minified blobs score
    low, making it the standard cheap LM-quality gate before an expensive
    model pass.

    ``avg_logprob = Σ_t tf(d,t)·ln(ctf(t)/total) / Σ_t tf(d,t)``

    Float-determinism: the per-doc Σ is a SEQUENTIAL FOLD over terms in
    ascending order (``sort_array(collect_list(struct(term,…)))`` +
    ``F.aggregate``), and the DuckDB oracle uses ``sum(… ORDER BY term)`` —
    both engines perform the identical IEEE addition chain, so results are
    bit-comparable (a plain ``sum()`` would be partial-aggregation-order
    dependent). The collect_list is bounded by per-doc vocabulary, not
    corpus size. Corpus totals ship as one broadcast scalar row. Pass a
    persisted ``tf`` (see :func:`term_frequencies`) to avoid the triple
    source scan lineage recompute otherwise costs."""
    if tf is None:
        tf = term_frequencies(df, col=col, id_col=id_col)
    ctf = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    tot = ctf.agg(F.sum("ctf").alias("total"))
    contrib = (
        tf.join(ctf, "term")
        .crossJoin(F.broadcast(tot))
        .withColumn("lp", F.col("tf") * F.log(F.col("ctf") / F.col("total")))
    )
    per_doc = contrib.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("term", "lp"))).alias("arr"),
        F.sum("tf").alias("n_tokens"),
    )
    summed = per_doc.select(
        "doc_id",
        "n_tokens",
        F.aggregate(
            "arr", F.lit(0.0), lambda acc, s: acc + s["lp"]
        ).alias("sum_lp"),
    )
    return summed.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("sum_lp") / F.col("n_tokens"), 6).alias("avg_logprob"),
    )


def repetition_stats(
    df: DataFrame, col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 'repetitious text'): per doc —

    * ``n_lines``        — physical lines ('\\n'-split)
    * ``dup_line_frac``  — 1 − distinct/total lines (fraction of line slots
                           occupied by a repeat of another line)
    * ``dup_char_frac``  — fraction of characters living in lines that occur
                           more than once
    * ``top_word_frac``  — occurrences of the single most frequent token ÷
                           total tokens (tokens as in :func:`ngram_counts`)

    Scale shape: two explode+hash-agg pipelines (lines, tokens) keyed by
    (doc, value) — content-derived uniform keys, map-side partials — then a
    doc-keyed agg and one doc-keyed join. Ratios are single divisions of
    integer aggregates, so values are exactly reproducible cross-engine."""
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(col), r"\n")).alias("line"),
    )
    per_line = lines.groupBy("doc_id", "line").agg(
        F.count("*").alias("cnt"), F.length("line").alias("len")
    )
    line_stats = per_line.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_lines"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("cnt") * F.col("len")).alias("n_chars"),
        F.sum(
            F.when(F.col("cnt") > 1, F.col("cnt") * F.col("len")).otherwise(0)
        ).alias("dup_chars"),
    )
    tok_stats = (
        term_frequencies(df, col=col, id_col=id_col)
        .groupBy("doc_id")
        .agg(F.max("tf").alias("top_tf"), F.sum("tf").alias("n_toks"))
    )
    joined = line_stats.join(tok_stats, "doc_id", "left")
    return joined.select(
        "doc_id",
        "n_lines",
        F.round(
            (F.col("n_lines") - F.col("n_distinct"))
            / F.col("n_lines").cast("double"),
            6,
        ).alias("dup_line_frac"),
        F.round(
            F.when(F.col("n_chars") > 0, F.col("dup_chars") / F.col("n_chars").cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("dup_char_frac"),
        F.round(
            F.coalesce(F.col("top_tf") / F.col("n_toks").cast("double"), F.lit(0.0)),
            6,
        ).alias("top_word_frac"),
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    col: str = "content",
    bench_col: str = "content",
    n: int = 13,
    id_col: str = "doc_id",
    broadcast_gram_limit: int = 2_000_000,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM-style n-gram overlap
    filter): flag every training document that shares at least one token
    ``n``-gram with a held-out evaluation set, so eval questions leaking
    into the training mix can be dropped or audited. Returns
    ``(doc_id, n_hits, contaminated)`` for ALL input docs — ``n_hits`` is
    the count of DISTINCT benchmark n-grams the doc contains (order- and
    multiplicity-insensitive, so it is stable across partitionings).

    Scale shape: regime-gated like the build's vocabulary join. When the
    distinct benchmark gram set fits ``broadcast_gram_limit`` (eval suites
    are millions of grams at most, orders of magnitude under the corpus),
    it is explicitly ``broadcast()`` so the corpus-side stream (explode +
    per-doc distinct grams) never shuffles for the probe: the contamination
    join is a map-side broadcast hash semi-join, followed by one doc-keyed
    hash-agg and a doc-keyed left join back to the id universe. A bigger
    benchmark (decontaminating against another corpus slice) falls back to
    a shuffle join on the gram — always correct, never a driver collect.
    n=13 is the published convention; tests use smaller n on synthetic
    corpora."""
    bench_grams = (
        benchmark.select(F.explode(_token_ngrams(bench_col, n)).alias("ngram"))
        .filter(F.col("ngram") != "")
        .distinct()
    )
    doc_grams = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(_token_ngrams(col, n))).alias("ngram"),
        )
        .filter(F.col("ngram") != "")
    )
    n_grams = bench_grams.limit(broadcast_gram_limit + 1).count()
    if n_grams <= broadcast_gram_limit:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        doc_grams.join(bench_grams, "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
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
