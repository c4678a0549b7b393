"""Deduplication operators for large-scale corpus curation.

All operators are DataFrame-native (exact/ngram paths) or Arrow-vectorized
numpy (minhash/simhash) — no per-row Python UDFs. Designed so every shuffle
key is a content-derived hash (uniform, no skew) and candidate generation
never materializes the O(n²) pair space:

* exact_dups / dedup_exact      — sha256 groupBy (one shuffle)
* ngram_jaccard_pairs           — shingle-inverted-index self-join: pairs are
                                  generated ONLY for docs sharing a shingle,
                                  with a document-frequency cap on shingles
                                  (stop-shingle removal) to bound the join
* minhash_signatures / minhash_candidate_pairs — MinHash + LSH banding:
                                  (band, band_hash) buckets join, candidates
                                  verified by signature-estimated Jaccard
* simhash64                     — 64-bit SimHash from term frequencies
* embedding_near_dups           — cosine near-duplicates via random
                                  hyperplane LSH buckets + exact verify
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1


# ------------------------------------------------------------------ exact
def exact_dups(df: DataFrame, col: str = "content") -> DataFrame:
    """(content_sha, n, doc_ids) for every exactly-duplicated text."""
    return (
        df.groupBy(F.sha2(F.col(col), 256).alias("content_sha"))
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .filter(F.col("n") > 1)
    )


def dedup_exact(df: DataFrame, col: str = "content") -> DataFrame:
    """Keep one row (lowest doc_id) per distinct text."""
    w = df.withColumn("__sha", F.sha2(F.col(col), 256)).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy("__sha").orderBy(F.col("doc_id").asc())
        ),
    )
    return w.filter(F.col("__rn") == 1).drop("__sha", "__rn")


# ---------------------------------------------------------------- n-grams
def token_ngrams(df: DataFrame, col: str = "content", n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct token n-gram shingles per doc, built with
    JVM-side split/transform (no Python)."""
    toks = F.split(F.lower(F.col(col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda t: F.length(t) > 1)
    # sequence(0, k) DESCENDS when k < 0, so guard short docs explicitly
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return (
        df.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str = "content",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with token-n-gram Jaccard >= t.

    Inverted-index join: only docs sharing a (non-stop) shingle pair up.
    ``max_shingle_df`` drops shingles shared by too many docs — they add
    O(df²) candidate pairs while implying near-zero Jaccard information.
    When the cap binds, the returned value is the Jaccard over the RARE
    shingle universe: intersections AND set sizes are both computed after
    the stop-shingle filter, so the approximation is self-consistent
    (inter ≤ sizes always; no silent underestimation from mixing universes).

    Direction caveat (exact-oracle comparisons are only valid while NO
    shingle hits the cap): dropping a shingle present in only one doc of a
    pair RAISES the pair's rare-universe Jaccard above its true Jaccard —
    deliberately recall-preserving for dedup candidate generation (a pair
    sharing rare content is surfaced even when one side carries lots of
    boilerplate); dropping a SHARED shingle lowers it. Pinned by
    tests/test_advice_fixes.py::test_jaccard_cap_binding_direction.
    """
    sh = token_ngrams(df, col, n).cache()
    rare = (
        sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        .filter(F.col("sdf") <= max_shingle_df)
        .select("shingle")
    )
    shr = sh.join(rare, "shingle")
    sizes = shr.groupBy("doc_id").agg(F.count("*").alias("sz"))
    pairs = (
        shr.alias("a")
        .join(shr.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


# ---------------------------------------------------------------- minhash
def _char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-gram shingle hashes of one document, fully vectorized.

    Reuses the fingerprints module's sliding-window polynomial kernel
    (textops._kgram_hashes: one strided matrix product over the byte
    stream) — the per-offset ``zlib.crc32(text[i:i+k])`` Python generator
    it replaces was the last scalar-Python hashing loop in the repo and
    CPU-bound the whole minhash stage at scale. Shingles are BYTE k-grams
    of the utf-8 encoding (identical to char k-grams for ASCII; an equally
    valid shingle family for multibyte text)."""
    from .textops import _kgram_hashes

    data = (text or "").encode()
    return np.unique(_kgram_hashes(data, k))


def minhash_signatures(
    df: DataFrame,
    col: str = "content",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """(doc_id, sig: array<long>) MinHash signatures, vectorized numpy inside
    one Arrow batch per partition (shingle → crc32 → a·x+b mod p → min)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out_id, out_sig = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[col]):
                x = _char_shingle_hashes(text, shingle_k)
                # (num_hashes, n_shingles) permutation mins, uint64 mod-prime
                hv = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE
                sig = hv.min(axis=1).astype(np.int64)
                out_id.append(doc_id)
                out_sig.append(sig.tolist())
            yield pd.DataFrame({"doc_id": out_id, "sig": out_sig})

    return df.select("doc_id", col).mapInPandas(run, schema)


def minhash_candidate_pairs(
    sigs: DataFrame,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket_size: int = 5000,
    stats_out: Optional[dict] = None,
) -> DataFrame:
    """LSH banding: (doc_a, doc_b, est_jaccard) for candidates whose whole
    band matches in >=1 band, verified by signature agreement fraction.

    Scale guards (both matter at 100 TB):

    * **Payload trim** — the band self-join carries only (doc_id, band, bh);
      full signatures rejoin ONCE per side after pair dedup, so the band
      exchange doesn't ship ``num_hashes`` longs per row twice.
    * **Bucket cap** — a (band, bh) bucket of n docs yields C(n, 2) join
      pairs; a near-identical boilerplate cluster of 10^5 docs (guaranteed
      in a web-scale code corpus — exact dedup only removes byte-identical
      copies) would put ~5×10^9 pairs in ONE bucket. Buckets larger than
      ``max_bucket_size`` switch from all-pairs to STAR pairs: every member
      pairs with the bucket's representative (min doc_id), O(n) pairs,
      preserving exactly the connectivity a connected-components /
      keep-one-per-cluster dedup needs. Star pairs still pass the same
      signature-agreement verify, so no unverified pair is emitted. NOT a
      silent cap: pass ``stats_out={}`` to get
      {capped_buckets, largest_bucket, star_pairs, allpairs_avoided}
      (costs one extra count job) — pinned by
      tests/test_quality_gates.py::test_minhash_bucket_cap_bounded.
    """
    num_hashes = len(sigs.select("sig").first()["sig"])
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    # one shuffle computes bucket size + representative alongside the rows
    w = Window.partitionBy("band", "bh")
    banded = banded.withColumn("bn", F.count("*").over(w)).withColumn(
        "rep", F.min("doc_id").over(w)
    )
    small = banded.filter(F.col("bn") <= max_bucket_size).select(
        "doc_id", "band", "bh"
    )
    big = banded.filter(F.col("bn") > max_bucket_size)
    if stats_out is not None:
        agg = (
            big.groupBy("band", "bh").agg(F.max("bn").alias("n"))
            .agg(
                F.count("*").alias("capped_buckets"),
                F.max("n").alias("largest_bucket"),
                F.sum(F.col("n") - 1).alias("star_pairs"),
                F.sum(F.col("n") * (F.col("n") - 1) / 2 - (F.col("n") - 1)).alias(
                    "allpairs_avoided"
                ),
            )
            .first()
        )
        stats_out.update(
            capped_buckets=int(agg["capped_buckets"] or 0),
            largest_bucket=int(agg["largest_bucket"] or 0),
            star_pairs=int(agg["star_pairs"] or 0),
            allpairs_avoided=int(agg["allpairs_avoided"] or 0),
        )
    pairs_small = (
        small.alias("a")
        .join(small.alias("b"), ["band", "bh"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    pairs_star = big.filter(F.col("doc_id") != F.col("rep")).select(
        F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    cands = pairs_small.unionByName(pairs_star).dropDuplicates(
        ["doc_a", "doc_b"]
    )
    # signatures rejoin once per side, AFTER pair dedup
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    cands = cands.join(sa, "doc_a").join(sb, "doc_b")
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    return (
        cands.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ----------------------------------------------------------------- simhash
def simhash64(df: DataFrame, col: str = "content") -> DataFrame:
    """(doc_id, simhash long): sign of tf-weighted sums of 64 term-hash bits.

    Fully vectorized inside each Arrow batch: terms are hashed ONCE per
    unique term (blake2b, process-stable — cached across batches), the
    ±1-bit matrix is expanded with one shift-and-mask broadcast, and the
    per-doc accumulation is a single ``np.add.at`` scatter over
    (doc_index, 64) — no per-token Python."""
    import hashlib

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("simhash", T.LongType()),
        ]
    )

    from .tokenizer import tokenize_batch

    _POWERS = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    _SHIFTS = np.arange(64, dtype=np.uint64)

    def run(batches: Iterable[pd.DataFrame]):
        hash_cache: dict = {}
        for pdf in batches:
            token_lists = tokenize_batch(pdf[col])
            n_docs = len(pdf)
            counts = np.fromiter(
                (len(t) for t in token_lists), dtype=np.int64, count=n_docs
            )
            total = int(counts.sum())
            if total == 0:
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "simhash": np.zeros(n_docs, np.int64)}
                )
                continue
            flat = np.empty(total, dtype=object)
            o = 0
            for toks in token_lists:
                flat[o : o + len(toks)] = toks
                o += len(toks)
            uniq, inv = np.unique(flat, return_inverse=True)
            hashes = np.empty(uniq.size, dtype=np.uint64)
            for i, t in enumerate(uniq):  # once per UNIQUE term, cached
                h = hash_cache.get(t)
                if h is None:
                    h = int.from_bytes(
                        hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                    )
                    hash_cache[t] = h
                hashes[i] = h
            # (U, 64) ±1 bit matrix, then scatter-add per doc
            bits = (
                ((hashes[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                * 2
                - 1
            )
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            acc = np.zeros((n_docs, 64), dtype=np.int64)
            np.add.at(acc, doc_idx, bits[inv])
            packed = ((acc > 0).astype(np.uint64) * _POWERS[None, :]).sum(axis=1)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "simhash": packed.view(np.int64)}
            )

    return df.select("doc_id", col).mapInPandas(run, schema)


def simhash_near_dups(df: DataFrame, col: str = "content", max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within a Hamming radius, candidates
    bucketed by 16-bit simhash chunks (any pair within radius 3 must agree
    on at least one of 4 chunks — pigeonhole)."""
    sh = simhash64(df, col)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ck"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.ck").alias("ck"))
    cands = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["chunk", "ck"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------- embeddings
def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 5000,
) -> DataFrame:
    """Cosine near-duplicate pairs via random-hyperplane LSH buckets + exact
    cosine verification inside each bucket.

    Same bucket guard as :func:`minhash_candidate_pairs`: an LSH bucket
    holding a mega-cluster of near-identical embeddings would go quadratic
    in the self-join, so buckets larger than ``max_bucket_size`` emit STAR
    pairs against the bucket representative (min id) instead of all-pairs —
    O(n) pairs, connectivity preserved for keep-one-per-cluster dedup, and
    every emitted pair still passes the exact cosine verify."""
    dim = len(emb.select(vec_col).first()[vec_col])
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((planes, dim))
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x))
    normed = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(v, lambda x: x / norm).alias("nv"),
    )
    sig = F.concat_ws(
        "",
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        "nv",
                        F.array(*[F.lit(float(x)) for x in hyper[p]]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda s, x: s + x,
                )
                >= 0,
                "1",
            ).otherwise("0")
            for p in range(planes)
        ],
    )
    w = Window.partitionBy("bucket")
    bucketed = (
        normed.withColumn("bucket", sig)
        .withColumn("bn", F.count("*").over(w))
        .withColumn("rep", F.min("vid").over(w))
    )
    small = bucketed.filter(F.col("bn") <= max_bucket_size)
    big = bucketed.filter(F.col("bn") > max_bucket_size)
    pairs_small = (
        small.alias("a")
        .join(small.alias("b"), "bucket")
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.nv").alias("nv_a"),
            F.col("b.nv").alias("nv_b"),
        )
    )
    reps = big.filter(F.col("vid") == F.col("rep")).select(
        "bucket", F.col("vid").alias("id_a"), F.col("nv").alias("nv_a")
    )
    pairs_star = (
        big.filter(F.col("vid") != F.col("rep"))
        .select("bucket", F.col("vid").alias("id_b"), F.col("nv").alias("nv_b"))
        .join(reps, "bucket")
        .select("id_a", "id_b", "nv_a", "nv_b")
    )
    pairs = pairs_small.unionByName(pairs_star)
    cos = F.aggregate(
        F.zip_with(F.col("nv_a"), F.col("nv_b"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


# ------------------------------------------------- connected components
def _canon_edges(pairs: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected edge set canonicalized to (u, v) with u > v, self-loops
    dropped, deduped."""
    e = pairs.select(
        F.greatest(F.col(a), F.col(b)).cast("long").alias("u"),
        F.least(F.col(a), F.col(b)).cast("long").alias("v"),
    )
    return e.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in the duplicate-pair edge set;
    ``component`` is the minimum node id reachable from ``node``.

    This is the representative pass VERDICT r4 prescribed for mega-clusters
    that LSH bucket caps route to star pairs: transitively close the pair
    graph so keep-one-per-cluster dedup removes a whole near-dup cluster,
    not just directly-paired docs.

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — each round
    is two groupBy-min shuffles over the CURRENT edge set (which only
    shrinks toward the star forest), and the round count is O(log² n)
    INDEPENDENT of graph diameter. Naive min-label propagation needs
    O(diameter) rounds — a chain of incrementally-edited boilerplate docs
    (realistic at 100 TB) makes that O(n); star contraction does not care.
    Lineage is truncated with localCheckpoint each round so the iterative
    plan does not grow (and Catalyst re-analysis stays O(1) per round).

    Convergence is detected by (count, xor-of-hashes) fingerprint equality
    of the canonical edge set — both computed in the same tiny aggregate
    job. ``max_iter`` is a backstop (raises, never silently truncates).
    """
    edges = _canon_edges(pairs, a, b).localCheckpoint()

    def fingerprint(e: DataFrame):
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                # bit_xor is order-independent → deterministic across
                # partitionings; hash collisions are backstopped by count
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("x"),
        ).first()
        return (row["n"], row["x"])

    fp = fingerprint(edges)
    for _ in range(max_iter):
        # large-star: attach every strictly-larger neighbor of u to
        # min(Γ(u) ∪ {u}); processed over the symmetrized edge set
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: attach u and all smaller neighbors to min(Γ≤(u))
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smin, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(smin.select(F.col("u").alias("n"), F.col("m")))
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        edges = small
        new_fp = fingerprint(edges)
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(edge fingerprint still changing: {fp} -> {new_fp})"
        )
    # converged edge set is a star forest: (child, root) with root = min
    # of the component; roots label themselves
    children = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return children.unionByName(roots)


def duplicate_clusters(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, cluster_id, cluster_size) per doc in any duplicate cluster —
    the transitive closure of the pair graph, cluster_id = min doc id."""
    comp = connected_components(pairs, a=a, b=b, max_iter=max_iter)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        "node", F.col("component").alias("cluster_id"), "cluster_size"
    )


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one representative (min doc id) per duplicate CLUSTER plus all
    unpaired docs. Non-representative cluster members are dropped via a
    broadcast-eligible anti-join on the (small) non-representative set —
    the corpus-sized side never shuffles."""
    comp = connected_components(pairs, a=a, b=b)
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
