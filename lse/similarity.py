"""Similarity search over an embedding column (array<float>).

* cosine_topk      — exact brute-force top-k, fully JVM-side
  (zip_with/aggregate inside whole-stage codegen; one scan, one top-k sort).
  The scale baseline: O(N·d) flops distributed over all partitions.
* cosine_topk_lsh  — random-hyperplane LSH bucketed variant: the query's
  bucket (plus optional multi-probe neighbors at Hamming distance 1) is the
  only data scanned. The scale path — bucket assignment is computed at
  ingest (signature column, partition/cluster by it) so a query touches
  ~N/2^planes rows.
* knn_join         — exact many-query k-NN JOIN (broadcast query side,
  corpus scored in place, WindowGroupLimit top-k); knn_join_ivf is the
  both-sides-large path (cell-cogrouped candidates via the IVF index).
* cosine_topk_ivf  — IVF (inverted-file) variant: a k-means coarse
  quantizer trained on a driver-side sample assigns every vector to its
  nearest centroid at INGEST (`ivf_assign`); a query ranks centroids by
  similarity and scans only the ``n_probe`` best cells — data-adaptive
  partitioning (unlike LSH's data-oblivious hyperplanes), the classic
  IVF-Flat layout. At 100 TB the cell id is the partition/cluster key, so
  a query touches ~N·n_probe/n_cells rows.
* cosine_topk_pq   — product-quantization ADC variant (Jegou et al. 2011,
  the FAISS IVF-PQ storage layout): `pq_encode` compresses each vector to
  m one-byte codes at INGEST (d=64 float32 → 8 B, 32×), and a query scores
  rows via an (m × n_codes) driver-built lookup table — at 100 TB the
  scoring scan reads the m-byte code column instead of the float vectors.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _vec_lit(v: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in v])


def cosine_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity: (vec_id, cos) ordered desc, ties by
    id asc."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, _vec_lit(q)) / (F.sqrt(_dot(v, v)) * F.lit(qn))
    return (
        emb.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def hyperplane_signature(
    emb: DataFrame,
    planes: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
    out: str = "lsh_sig",
) -> DataFrame:
    """Append the random-hyperplane sign signature (int) — computed at
    ingest time so queries prune on it."""
    dim = len(emb.select(vec_col).first()[vec_col])
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((planes, dim))
    v = F.col(vec_col).cast("array<double>")
    sig = F.lit(0)
    for p in range(planes):
        bit = F.when(_dot(v, _vec_lit(hyper[p])) >= 0, 1).otherwise(0)
        sig = sig + bit * F.lit(1 << p)
    return emb.withColumn(out, sig)


def cosine_topk_lsh(
    emb_with_sig: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    planes: int = 8,
    seed: int = 7,
    multiprobe: int = 1,
    probes: Optional[int] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig_col: str = "lsh_sig",
) -> DataFrame:
    """Approximate top-k over the query's LSH bucket neighborhood.

    Two probing modes:
    * ``multiprobe=r`` — scan every bucket within Hamming distance r
      (simple, probe count grows as C(planes, ≤r));
    * ``probes=T`` — QUERY-DIRECTED multiprobe (Lv et al., VLDB'07): rank
      candidate buckets by the summed |margin| of the hyperplanes whose bits
      they flip — a near-boundary hyperplane is the likeliest to disagree
      with a true neighbor — and scan only the T best buckets. Much higher
      recall per scanned row; this is the 100-TB path (T ≪ 2^planes).
    """
    dim = len(np.asarray(query_vec))
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    margins = hyper @ q  # signed distance to each hyperplane (unnormalized)
    qsig = 0
    for p in range(planes):
        if float(margins[p]) >= 0:
            qsig |= 1 << p
    if probes is not None:
        from itertools import combinations

        penalty = np.abs(margins)
        scored = [(0.0, qsig)]
        for r in range(1, planes + 1):
            for flips in combinations(range(planes), r):
                cost = float(penalty[list(flips)].sum())
                sig = qsig
                for p in flips:
                    sig ^= 1 << p
                scored.append((cost, sig))
            if len(scored) >= probes * 4:  # enough candidates to rank
                break
        scored.sort()
        probe = {sig for _cost, sig in scored[: max(1, probes)]}
    else:
        probe = {qsig}
        frontier = {qsig}
        for _ in range(multiprobe):
            frontier = {s ^ (1 << p) for s in frontier for p in range(planes)}
            probe |= frontier
    pruned = emb_with_sig.filter(F.col(sig_col).isin(sorted(probe)))
    return cosine_topk(pruned, query_vec, k, id_col=id_col, vec_col=vec_col)


# --------------------------------------------------------------------- IVF
def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN JOIN: for EVERY query vector, the top-k corpus neighbors
    by cosine — the many-query batch form of :func:`cosine_topk` (labeling
    a dataset against a prototype set, building a near-neighbor graph).
    Returns (qid, rnk, vec_id, cos), rnk 1..k, ties on vec_id asc.

    Scale shape: the QUERY side broadcasts (it is the small side by
    convention — prototypes, probes, a label set), so the corpus is scored
    in place with zero shuffle of the big side; the only exchange is the
    thin (qid, vec_id, cos) stream into the per-query top-k window, and
    WindowGroupLimit pushes the rank cut map-side before it. Each side's
    L2 norm is projected ONCE per row BEFORE the join — the naive
    per-pair cosine recomputes the corpus norm Q times and evaluates
    three interpreted higher-order aggregates per pair; hoisting leaves
    one dot per pair (≈3× in the hot stage, measured). The arithmetic
    shape stays dot/(cn·qn) — identical to the DuckDB oracle's. For a
    LARGE query side use :func:`knn_join_ivf` — cell-cogrouped candidates
    instead of Q×N flops."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qe"),
    ).withColumn("qn", F.sqrt(_dot(F.col("qe"), F.col("qe"))))
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("ce"),
    ).withColumn("cn", F.sqrt(_dot(F.col("ce"), F.col("ce"))))
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid",
        "vec_id",
        (
            _dot(F.col("ce"), F.col("qe")) / (F.col("cn") * F.col("qn"))
        ).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "vec_id", F.round("cos", 4).alias("cos"))
    )


def knn_join_bulk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched throughput kernel for the exact k-NN join — same
    semantics as :func:`knn_join`, different physical strategy: the query
    matrix ships to every task ONCE (normalized, driver-collected — it is
    the small side by contract), each corpus Arrow batch scores against
    ALL queries in one (batch × d)·(d × Q) numpy matmul, and only the
    per-batch per-query top-k partials (k·Q rows per batch) leave the
    scan — the final window merges partials, so the exchange is
    O(k·Q·batches), independent of corpus size. Use this over the JVM
    expression path when Q·d is large enough that per-pair interpreted
    higher-order aggregates dominate: measured on 512 k × 21 queries ×
    64 dims at local[8], 11.5 s (JVM) vs 1.8 s (bulk) — 6.4×, and the gap
    widens with corpus size while sub-100 k corpora are job-overhead
    bound either way. The JVM path remains the oracle-bound reference. Scores differ from the sequential
    fold only by SIMD summation order (≤1e-12 relative; parity pinned at
    1e-9 with tie-tolerant rank comparison)."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import types as T

    qrows = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qe"),
    ).collect()
    if not qrows:
        schema = "qid long, rnk int, vec_id long, cos double"
        return queries.sparkSession.createDataFrame([], schema)
    qids = np.asarray([r["qid"] for r in qrows], dtype=np.int64)
    qm = np.asarray([r["qe"] for r in qrows], dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-300)
    kk = int(k)

    schema = T.StructType(
        [
            T.StructField("qid", T.LongType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            x = np.asarray(pdf["ce"].tolist(), dtype=np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            s = x @ qm.T  # (batch, Q) cosines
            top = min(kk, s.shape[0])
            # per-query partial top-k: argpartition then exact sort of the
            # top slice (ties resolved later by the global window)
            part = np.argpartition(-s, top - 1, axis=0)[:top]
            out_q, out_i, out_c = [], [], []
            for col in range(s.shape[1]):
                rows = part[:, col]
                out_q.extend([qids[col]] * len(rows))
                out_i.extend(ids[rows])
                out_c.extend(s[rows, col])
            yield pd.DataFrame(
                {"qid": out_q, "vec_id": out_i, "cos": out_c}
            )

    partials = (
        corpus.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("ce"),
        )
        .mapInPandas(score, schema)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        partials.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= kk)
        .select("qid", "rnk", "vec_id", F.round("cos", 4).alias("cos"))
    )


def probe_cells(
    queries: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 4,
    vec_col: str = "embedding",
    out: str = "probe_cells",
) -> DataFrame:
    """Append each query's ``n_probe`` nearest-centroid cell ids (array) —
    the query-side analog of :func:`ivf_assign`. Arrow-batched numpy: one
    (batch × cells) matmul + argsort per batch."""
    import pandas as pd
    from pyspark.sql import types as T

    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    n_probe = max(1, min(int(n_probe), cent.shape[0]))

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                x = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                )
                order = np.argsort(-(x @ cent.T), axis=1, kind="stable")
                pdf[out] = [
                    [int(c) for c in row[:n_probe]] for row in order
                ]
            else:
                pdf[out] = pd.Series(dtype="object")
            yield pdf

    schema = T.StructType(
        list(queries.schema.fields)
        + [T.StructField(out, T.ArrayType(T.IntegerType()))]
    )
    return queries.mapInPandas(run, schema)


def knn_join_ivf(
    queries: DataFrame,
    corpus_with_cell: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    broadcast_query_limit: int = 100_000,
) -> DataFrame:
    """Approximate k-NN JOIN through the IVF index: each query scores only
    the corpus rows in its ``n_probe`` nearest cells — Q·N·(n_probe/
    n_cells) flops instead of Q·N, the scale path when BOTH sides are
    large. Candidates meet on the cell id (the corpus' cluster/partition
    key at scale, so the join is co-located); exact cosine + per-query
    top-k within the candidates. Recall vs the exact join is pinned ≥0.9
    by tests/test_similarity_join.py at n_probe=4/16 cells.

    Join strategy is REGIME-GATED: the exploded query side carries
    Q·n_probe full float64 embeddings (10 M queries × 4 probes × 64 dims
    ≈ 20 GB — far past any broadcast budget, and this function exists for
    the both-sides-large case). One row-count probe on the query side
    decides: ≤ ``broadcast_query_limit`` rows → explicit broadcast (the
    corpus never shuffles); above it → a plain equi-join on the cell id,
    letting the planner hash-partition BOTH sides on ``cell_col`` so
    candidates meet co-located without any driver-side collect."""
    from pyspark.sql import Window

    probes = probe_cells(queries, centroids, n_probe=n_probe, vec_col=vec_col)
    q = probes.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qe"),
        F.explode("probe_cells").alias(cell_col),
    ).withColumn("qn", F.sqrt(_dot(F.col("qe"), F.col("qe"))))
    c = corpus_with_cell.select(
        F.col(cell_col),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("ce"),
    ).withColumn("cn", F.sqrt(_dot(F.col("ce"), F.col("ce"))))
    if queries.limit(broadcast_query_limit + 1).count() <= broadcast_query_limit:
        q = F.broadcast(q)
    scored = c.join(q, cell_col).select(
        "qid",
        "vec_id",
        (
            _dot(F.col("ce"), F.col("qe")) / (F.col("cn") * F.col("qn"))
        ).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", "rnk", "vec_id", F.round("cos", 4).alias("cos"))
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    seed: int = 11,
    iters: int = 10,
    sample_cap: int = 50_000,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer on a bounded driver-side sample.

    Vectors are L2-normalized (cosine == dot thereafter); Lloyd iterations
    run in bulk numpy; empty cells re-seed deterministically from the
    farthest points. The sample cap bounds driver memory — at 100 TB the
    quantizer trains on a sample regardless (standard IVF practice)."""
    rows = emb.select(vec_col).limit(sample_cap).collect()
    x = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.maximum(norms, 1e-12)
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    k = min(n_cells, n)
    cent = x[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T  # (n, k) cosine
        assign = np.argmax(sims, axis=1)
        new = np.zeros_like(cent)
        np.add.at(new, assign, x)
        counts = np.bincount(assign, minlength=k)
        empty = counts == 0
        if empty.any():
            # re-seed empty cells from the worst-assigned points
            worst = np.argsort(sims[np.arange(n), assign])[: int(empty.sum())]
            new[empty] = x[worst]
            counts[empty] = 1
        cent = new / np.maximum(
            np.linalg.norm(new, axis=1, keepdims=True), 1e-12
        )
    return cent


def ivf_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "ivf_cell",
) -> DataFrame:
    """Append each vector's nearest-centroid cell id — the INGEST-time step
    (cluster/partition the table by this column at scale). Arrow-batched
    numpy: one (batch × cells) matmul per batch."""
    import pandas as pd

    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    cols = emb.columns

    def run(batches):
        for pdf in batches:
            if len(pdf):
                x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                x = x / np.maximum(
                    np.linalg.norm(x, axis=1, keepdims=True), 1e-12
                )
                pdf = pdf.copy()
                pdf[out] = np.argmax(x @ cent.T, axis=1).astype(np.int32)
            else:
                pdf = pdf.copy()
                pdf[out] = pd.Series(dtype="int32")
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField(out, T.IntegerType())]
    )
    return emb.mapInPandas(run, schema)


def cosine_topk_ivf(
    emb_with_cell: DataFrame,
    centroids: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Approximate top-k scanning only the ``n_probe`` cells whose
    centroids are most similar to the query; exact cosine within them."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(centroids @ qn), kind="stable")
    probe = [int(c) for c in order[: max(1, n_probe)]]
    pruned = emb_with_cell.filter(F.col(cell_col).isin(probe))
    return cosine_topk(pruned, query_vec, k, id_col=id_col, vec_col=vec_col)


# --------------------------------------------------------------- PQ (ADC)
def _l2_kmeans(x: np.ndarray, n_codes: int, seed: int, iters: int) -> np.ndarray:
    """Euclidean Lloyd iterations on one PQ subspace — deterministic
    seeding and empty-cell re-seed from the worst-fit points (the same
    policy as the IVF coarse quantizer). Distances use the expanded
    ||x||^2 + ||c||^2 - 2x.c identity so memory stays O(n * n_codes)."""
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    kc = min(int(n_codes), n)
    cent = x[rng.choice(n, size=kc, replace=False)]
    xsq = (x * x).sum(axis=1)
    for _ in range(iters):
        d2 = xsq[:, None] + (cent * cent).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
        assign = np.argmin(d2, axis=1)
        new = np.zeros_like(cent)
        np.add.at(new, assign, x)
        counts = np.bincount(assign, minlength=kc)
        empty = counts == 0
        if empty.any():
            worst = np.argsort(-d2[np.arange(n), assign])[: int(empty.sum())]
            new[empty] = x[worst]
            counts[empty] = 1
        cent = new / counts[:, None]
    return cent


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    n_codes: int = 32,
    seed: int = 13,
    iters: int = 12,
    sample_cap: int = 50_000,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks (m, n_codes, d/m): vectors are
    L2-normalized (cosine == dot thereafter), split into m subspaces, and
    each subspace gets its own L2 k-means codebook. Training runs on a
    bounded driver-side sample — at 100 TB the quantizer trains on a
    sample regardless (standard PQ practice, cf. Jegou et al. 2011).
    n_codes <= 256 keeps one code one byte."""
    if n_codes > 256:
        raise ValueError("n_codes must be <= 256 (one byte per code)")
    rows = emb.select(vec_col).limit(sample_cap).collect()
    x = np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, min(n_codes, x.shape[0]), dsub), dtype=np.float64)
    for j in range(m):
        books[j] = _l2_kmeans(x[:, j * dsub : (j + 1) * dsub], n_codes, seed + j, iters)
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out: str = "pq_code",
) -> DataFrame:
    """Append each vector's PQ code as an m-byte BINARY column — the
    INGEST-time step. A d=64 float32 vector (256 B) becomes m=8 bytes:
    32x storage compression for the candidate-scoring payload, the lever
    that lets a 100-TB embedding column serve ANN from a fraction of the
    footprint. Arrow-batched numpy: per subspace one (batch x n_codes)
    distance matmul + argmin."""
    import pandas as pd
    from pyspark.sql import types as T

    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    bsq = [(books[j] * books[j]).sum(axis=1) for j in range(m)]

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
                codes = np.empty((x.shape[0], m), dtype=np.uint8)
                for j in range(m):
                    sub = x[:, j * dsub : (j + 1) * dsub]
                    d2 = (
                        (sub * sub).sum(axis=1)[:, None]
                        + bsq[j][None, :]
                        - 2.0 * (sub @ books[j].T)
                    )
                    codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
                pdf[out] = [c.tobytes() for c in codes]
            else:
                pdf[out] = pd.Series(dtype="object")
            yield pdf

    schema = T.StructType(
        list(emb.schema.fields) + [T.StructField(out, T.BinaryType())]
    )
    return emb.mapInPandas(run, schema)


def cosine_topk_pq(
    codes: DataFrame,
    codebooks: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Approximate top-k over PQ codes by asymmetric distance computation
    (ADC): the query builds an (m, n_codes) lookup table of subspace dot
    products ONCE on the driver; each row's score is m table lookups and
    an add — no float vectors are read at query time. Arrow-batched with
    per-batch top-k partials, so only k rows per batch reach the final
    TakeOrdered. Scores approximate cosine (vectors were normalized at
    encode time); ties break vec_id asc."""
    import pandas as pd
    from pyspark.sql import types as T

    books = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    lut = np.stack(
        [books[j] @ q[j * dsub : (j + 1) * dsub] for j in range(m)]
    )  # (m, n_codes)
    kk = int(k)

    def run(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            blobs = pdf[code_col].tolist()
            bad = [
                i for i, b in enumerate(blobs)
                if b is None or len(b) != m
            ]
            if bad:  # a null/short code reshapes into garbage — name it
                raise ValueError(
                    "cosine_topk_pq: column %r has %d row(s) that are not "
                    "%d-byte PQ codes (first bad %s=%r) — was pq_encode "
                    "run over every row?"
                    % (code_col, len(bad), m,
                       id_col, pdf[id_col].iloc[bad[0]])
                )
            codes_m = np.frombuffer(
                b"".join(blobs), dtype=np.uint8
            ).reshape(n, m)
            score = lut[np.arange(m)[None, :], codes_m].sum(axis=1)
            top = np.lexsort((pdf[id_col].to_numpy(), -score))[:kk]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64)[top],
                    "score": score[top],
                }
            )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    part = codes.mapInPandas(run, schema)
    return (
        part.orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(kk)
        # honor the caller's id_col: downstream (e.g. the refine join)
        # selects by that name, which raised AnalysisException for any
        # non-default id_col (ADVICE r5)
        .select(F.col("vec_id").alias(id_col), F.round("score", 6).alias("score"))
    )


def cosine_topk_pq_refine(
    emb_with_code: DataFrame,
    codebooks: np.ndarray,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """PQ with exact refinement (the FAISS IVFPQ+refine pattern): ADC over
    the m-byte codes produces a ``shortlist * k`` candidate list, then true
    cosine is recomputed from the float vectors for ONLY those rows —
    recall ~0.98 at shortlist=5 on the test corpus vs ~0.68 raw ADC, while
    the full scan still reads just the code column. The shortlist is tiny
    (k*shortlist rows) so the refine join broadcasts."""
    short = cosine_topk_pq(
        emb_with_code, codebooks, query_vec,
        k=max(1, int(k) * int(shortlist)), id_col=id_col, code_col=code_col,
    ).select(id_col)
    sub = emb_with_code.join(F.broadcast(short), id_col)
    return cosine_topk(sub, query_vec, k, id_col=id_col, vec_col=vec_col)
