"""Independent driver-side replicas of the non-SQL-expressible operators —
the golden-fixture oracle lane.

Seven operators (minhash LSH pairs, simhash, winnowing fingerprints, LSH /
IVF ANN, fake image/audio decode features) compute results DuckDB cannot
express directly, so their correctness gate works through GOLDEN FIXTURES:
each function here recomputes the operator's exact expected output with an
independent implementation (pure pandas/numpy, no Spark), the results are
persisted as parquet under ``goldens/<sf>/`` (scripts/make_goldens.py), and
``__spark_entry__.oracle_sql`` SELECTs them back so the driver's
value-hash comparison binds the Spark kernels.

What "independent" means per operator — the parts that genuinely
cross-check, vs the parts that are shared SPEC (seeds, hash-family
constants, the deterministic fake-decode contract) and must match by
definition:

* k-gram hashing (minhash shingles, fingerprints): computed here in the
  DIRECT window-product form ``h_i = Σ_j data[i+j]·p^(k-1-j) mod 2^64`` —
  an independent derivation of textops._kgram_hashes' O(n) telescoped
  prefix-sum kernel, so any algebra bug there breaks the match.
* winnowing window minimum: canonical monotonic-deque scan vs the
  production kernel's strided sliding_window_view reduction.
* minhash LSH banding: exact band-slice tuple equality in a dict vs the
  production xxhash64(concat) bucket join (hash collisions would surface
  as a mismatch here, not be silently shared).
* simhash tokenization: the SCALAR tokenizer lane (terms_only) vs the
  production batch lane — doubling as a tokenizer-parity probe.
* ANN: hyperplane signatures / probe selection / cosine top-k recomputed
  driver-side against the production's JVM fold + pruned scan. The IVF
  k-means TRAJECTORY mirrors the production numeric kernels (matmul /
  argmax) deliberately: Lloyd iterations are chaotic, so an oracle must
  share the arithmetic to share the fixed point; the checked surface is
  assignment, probing and exact re-ranking.

Float rounding uses decimal HALF_UP to match Spark's F.round (BigDecimal
HALF_UP), not Python/numpy banker's rounding.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict, deque
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

_FP_PRIME = np.uint64(1099511628211)  # FNV-64 prime (shared hash-family spec)
_MERSENNE = (1 << 61) - 1


def _round_half_up(x: float, ndigits: int) -> float:
    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _kgram_hashes_window(data: bytes, k: int) -> np.ndarray:
    """Direct window-product polynomial k-gram hashes (mod 2^64 via uint64
    wraparound) — independent of the telescoped prefix-sum kernel."""
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    if b.size < k:
        powers = _FP_PRIME ** np.arange(b.size - 1, -1, -1, dtype=np.uint64)
        return np.array([(b * powers).sum()], dtype=np.uint64)
    powers = _FP_PRIME ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    return (win * powers[None, :]).sum(axis=1, dtype=np.uint64)


# ------------------------------------------------------------- fingerprints
def oracle_fingerprints(docs: pd.DataFrame, k: int = 8, window: int = 16) -> pd.DataFrame:
    """(doc_id, n_fp): distinct winnowing fingerprint count per doc, via the
    canonical monotonic-deque sliding-window minimum."""
    out_id, out_n = [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        hs = _kgram_hashes_window((text or "").lower().encode("utf-8"), k)
        if hs.size <= window:
            mins = {int(hs.min())}
        else:
            mins = set()
            dq: deque = deque()
            for i in range(hs.size):
                while dq and hs[dq[-1]] >= hs[i]:
                    dq.pop()
                dq.append(i)
                if dq[0] <= i - window:
                    dq.popleft()
                if i >= window - 1:
                    mins.add(int(hs[dq[0]]))
        out_id.append(int(doc_id))
        out_n.append(len(mins))
    return pd.DataFrame(
        {"doc_id": pd.array(out_id, dtype="int64"), "n_fp": pd.array(out_n, dtype="int64")}
    )


# ------------------------------------------------------------------ minhash
def oracle_minhash_pairs(
    docs: pd.DataFrame,
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
    bands: int = 16,
    threshold: float = 0.2,
) -> pd.DataFrame:
    """(doc_a, doc_b, est_jaccard): LSH band candidates by exact band-slice
    equality, verified by signature agreement fraction."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
    sigs: dict = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        x = np.unique(_kgram_hashes_window((text or "").encode(), shingle_k))
        hv = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        sigs[int(doc_id)] = hv.min(axis=1).astype(np.int64)
    rpb = num_hashes // bands
    buckets: dict = defaultdict(list)
    for doc_id, sig in sigs.items():
        for band in range(bands):
            buckets[(band, tuple(sig[band * rpb : (band + 1) * rpb]))].append(doc_id)
    cands = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    rows = []
    for da, db in sorted(cands):
        est = float((sigs[da] == sigs[db]).sum()) / float(num_hashes)
        if est >= threshold:
            rows.append((da, db, _round_half_up(est, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"}
    )


# ------------------------------------------------------------------ simhash
def oracle_simhash(docs: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, simhash): scalar-lane tokenization + per-unique-term blake2b
    bit votes, packed to a signed int64."""
    from .tokenizer import terms_only

    out_id, out_h = [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        acc = np.zeros(64, dtype=np.int64)
        for term, tf in Counter(terms_only(text or "")).items():
            h = int.from_bytes(
                hashlib.blake2b(term.encode(), digest_size=8).digest(), "big"
            )
            for s in range(64):
                acc[s] += tf * (2 * ((h >> s) & 1) - 1)
        packed = 0
        for s in range(64):
            if acc[s] > 0:
                packed |= 1 << s
        if packed >= 1 << 63:
            packed -= 1 << 64
        out_id.append(int(doc_id))
        out_h.append(packed)
    return pd.DataFrame(
        {"doc_id": pd.array(out_id, dtype="int64"), "simhash": pd.array(out_h, dtype="int64")}
    )


# ------------------------------------------------------- fake-decode lanes
def _payload_seed_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "big")
    return np.random.default_rng(seed)


def oracle_image_features(docs: pd.DataFrame) -> pd.DataFrame:
    """(id, width, height, feature_dim) under the deterministic fake decode
    contract: blake2b(payload)-seeded rng draws height then width."""
    out = {"id": [], "width": [], "height": [], "feature_dim": []}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        rng = _payload_seed_rng((text or "").encode("utf-8"))
        h = int(rng.integers(8, 32))
        w = int(rng.integers(8, 32))
        out["id"].append(int(doc_id))
        out["width"].append(w)
        out["height"].append(h)
        out["feature_dim"].append(16)
    return pd.DataFrame(out).astype("int64")


def oracle_audio_features(docs: pd.DataFrame) -> pd.DataFrame:
    """(id, n_frames, duration_ms, rms) under the fake decode contract:
    n ~ integers(64,512), ch ~ integers(1,3), samples ~ uniform(-1,1)."""
    out = {"id": [], "n_frames": [], "duration_ms": [], "rms": []}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        rng = _payload_seed_rng((text or "").encode("utf-8"))
        n = int(rng.integers(64, 512))
        ch = int(rng.integers(1, 3))
        samples = rng.uniform(-1.0, 1.0, size=(n, ch))
        mono = samples.mean(axis=1)
        out["id"].append(int(doc_id))
        out["n_frames"].append(n)
        out["duration_ms"].append(int(round(n * 1000.0 / 8000)))
        out["rms"].append(_round_half_up(float(np.sqrt((mono**2).mean())), 6))
    df = pd.DataFrame(out)
    return df.astype({"id": "int64", "n_frames": "int64", "duration_ms": "int64", "rms": "float64"})


# ---------------------------------------------------------------------- ANN
def _emb_matrix(emb: pd.DataFrame):
    ids = emb["vec_id"].to_numpy(dtype=np.int64)
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    return ids, X


def _cos_topk(ids: np.ndarray, X: np.ndarray, q: np.ndarray, k: int) -> pd.DataFrame:
    qn = float(np.linalg.norm(q))
    cos = (X @ q) / (np.sqrt((X * X).sum(axis=1)) * qn)
    order = np.lexsort((ids, -cos))[:k]
    return pd.DataFrame(
        {
            "vec_id": pd.array(ids[order], dtype="int64"),
            "cos": [ _round_half_up(float(c), 4) for c in cos[order] ],
        }
    ).astype({"cos": "float64"})


def oracle_ann_lsh(
    emb: pd.DataFrame, planes: int = 6, seed: int = 7, probes: int = 16, k: int = 10
) -> pd.DataFrame:
    """(vec_id, cos): query-directed multiprobe LSH — full 2^planes bucket
    enumeration ranked by flipped-hyperplane |margin| cost, then exact
    cosine top-k over the probed rows."""
    ids, X = _emb_matrix(emb)
    q = X[np.flatnonzero(ids == 0)[0]]
    dim = X.shape[1]
    rng = np.random.default_rng(seed)
    hyper = rng.standard_normal((planes, dim))
    margins = hyper @ q
    qsig = 0
    for p in range(planes):
        if float(margins[p]) >= 0:
            qsig |= 1 << p
    penalty = np.abs(margins)
    scored = []
    for mask in range(1 << planes):
        cost = float(penalty[[p for p in range(planes) if mask & (1 << p)]].sum())
        scored.append((cost, qsig ^ mask))
    scored.sort()
    probe = {sig for _c, sig in scored[: max(1, probes)]}
    sigs = np.zeros(ids.size, dtype=np.int64)
    dots = X @ hyper.T  # (n, planes)
    for p in range(planes):
        sigs |= (dots[:, p] >= 0).astype(np.int64) << p
    mask = np.isin(sigs, sorted(probe))
    return _cos_topk(ids[mask], X[mask], q, k)


def _ivf_kmeans(
    x: np.ndarray, n_cells: int = 16, seed: int = 11, iters: int = 10
) -> np.ndarray:
    """Spherical k-means on pre-normalized rows — the shared quantizer
    kernel of the IVF oracles (numerics mirror lse.similarity.
    train_ivf_centroids: same seeding, Lloyd steps, empty-cell re-seed)."""
    n = x.shape[0]
    rng = np.random.default_rng(seed)
    kc = min(n_cells, n)
    cent = x[rng.choice(n, size=kc, replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        new = np.zeros_like(cent)
        np.add.at(new, assign, x)
        counts = np.bincount(assign, minlength=kc)
        empty = counts == 0
        if empty.any():
            worst = np.argsort(sims[np.arange(n), assign])[: int(empty.sum())]
            new[empty] = x[worst]
            counts[empty] = 1
        cent = new / np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
    return cent


def oracle_ann_ivf(
    emb: pd.DataFrame,
    n_cells: int = 16,
    seed: int = 11,
    iters: int = 10,
    n_probe: int = 4,
    k: int = 10,
) -> pd.DataFrame:
    """(vec_id, cos): IVF-Flat — spherical k-means quantizer (numeric kernel
    mirrored; see module docstring), nearest-cell assignment, probe the
    n_probe most-similar cells, exact cosine top-k inside them."""
    ids, X = _emb_matrix(emb)
    q = X[np.flatnonzero(ids == 0)[0]]
    x = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cent = _ivf_kmeans(x, n_cells=n_cells, seed=seed, iters=iters)
    cells = np.argmax(x @ cent.T, axis=1)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(cent @ qn), kind="stable")
    probe = set(int(c) for c in order[: max(1, n_probe)])
    mask = np.isin(cells, sorted(probe))
    return _cos_topk(ids[mask], X[mask], q, k)


def oracle_knn_join_ivf(
    emb: pd.DataFrame,
    n_cells: int = 16,
    seed: int = 11,
    iters: int = 10,
    n_probe: int = 4,
    k: int = 5,
    query_mod: int = 97,
) -> pd.DataFrame:
    """(qid, rnk, vec_id, cos): IVF k-NN JOIN — every ``vec_id % query_mod
    == 0`` vector probes its n_probe nearest cells and takes the exact
    cosine top-k among the cells' members (ties vec_id asc), replicating
    lse.similarity.knn_join_ivf's quantize → probe → cell-join → window
    plan with a sequential per-query scan."""
    ids, X = _emb_matrix(emb)
    x = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cent = _ivf_kmeans(x, n_cells=n_cells, seed=seed, iters=iters)
    cells = np.argmax(x @ cent.T, axis=1)
    rows = []
    for qi in np.flatnonzero(ids % query_mod == 0):
        q = X[qi]
        qn = q / max(float(np.linalg.norm(q)), 1e-12)
        order = np.argsort(-(cent @ qn), kind="stable")
        probe = sorted(int(c) for c in order[: max(1, n_probe)])
        mask = np.isin(cells, probe)
        cids, cX = ids[mask], X[mask]
        cos = (cX @ q) / (
            np.sqrt((cX * cX).sum(axis=1)) * float(np.linalg.norm(q))
        )
        top = np.lexsort((cids, -cos))[:k]
        rows.extend(
            (int(ids[qi]), r, int(cids[j]), _round_half_up(float(cos[j]), 4))
            for r, j in enumerate(top, 1)
        )
    df = pd.DataFrame(rows, columns=["qid", "rnk", "vec_id", "cos"])
    return df.astype(
        {"qid": "int64", "rnk": "int64", "vec_id": "int64", "cos": "float64"}
    )


def _pq_l2_kmeans(
    x: np.ndarray, n_codes: int, seed: int, iters: int
) -> np.ndarray:
    """Euclidean Lloyd on one PQ subspace — mirrors lse.similarity.
    _l2_kmeans (same seeding, expanded-identity distances, empty-cell
    re-seed from the worst-fit points)."""
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


def oracle_ann_pq(
    emb: pd.DataFrame,
    m: int = 16,
    n_codes: int = 64,
    seed: int = 13,
    iters: int = 12,
    k: int = 10,
    shortlist: int = 5,
) -> pd.DataFrame:
    """(vec_id, cos): PQ + exact refine — per-subspace L2 codebooks on the
    normalized vectors, argmin encoding, ADC lookup-table scoring for a
    shortlist*k candidate list, then exact cosine top-k within it
    (replicates lse.similarity.cosine_topk_pq_refine end to end)."""
    ids, X = _emb_matrix(emb)
    q = X[np.flatnonzero(ids == 0)[0]]
    x = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    dsub = d // m
    books = np.empty((m, min(n_codes, x.shape[0]), dsub), dtype=np.float64)
    codes = np.empty((x.shape[0], m), dtype=np.int64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        books[j] = _pq_l2_kmeans(sub, n_codes, seed + j, iters)
        d2 = (
            (sub * sub).sum(axis=1)[:, None]
            + (books[j] * books[j]).sum(axis=1)[None, :]
            - 2.0 * (sub @ books[j].T)
        )
        codes[:, j] = np.argmin(d2, axis=1)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    lut = np.stack(
        [books[j] @ qn[j * dsub : (j + 1) * dsub] for j in range(m)]
    )
    score = lut[np.arange(m)[None, :], codes].sum(axis=1)
    short = np.lexsort((ids, -score))[: k * shortlist]
    return _cos_topk(ids[short], X[short], q, k)


# ---------------------------------------------------------------- video
def synthetic_video_frames(doc_id: int, h: int = 8, w: int = 8):
    """Deterministic luma frames for the video oracle lane: frame count and
    pixel values are pure functions of doc_id (the SHARED fixture spec the
    Spark query encodes to Y4M and the replica computes analytically)."""
    nf = 1 + int(doc_id) % 20
    y, x = np.mgrid[0:h, 0:w]
    return [
        ((int(doc_id) * 31 + k * 7 + x + y * w) % 256).astype(np.uint8)
        for k in range(nf)
    ]


def oracle_video_features(docs: pd.DataFrame, every_n: int = 5) -> pd.DataFrame:
    """(id, width, height, fps, n_frames, sampled_frames, y_mean, y_std)
    computed ANALYTICALLY from the synthetic frame spec — no Y4M bytes are
    built here, so the Spark side's encode→decode round trip through
    lse.y4m is what the match certifies."""
    out = {k: [] for k in ("id", "width", "height", "fps", "n_frames",
                           "sampled_frames", "y_mean", "y_std")}
    for doc_id in docs["doc_id"]:
        frames = synthetic_video_frames(int(doc_id))
        nf = len(frames)
        sampled = frames[::every_n]
        luma = np.concatenate([f.ravel() for f in sampled]).astype(np.float64)
        out["id"].append(int(doc_id))
        out["width"].append(8)
        out["height"].append(8)
        out["fps"].append(25.0)
        out["n_frames"].append(nf)
        out["sampled_frames"].append(len(sampled))
        out["y_mean"].append(_round_half_up(float(luma.mean()), 6))
        out["y_std"].append(_round_half_up(float(luma.std()), 6))
    df = pd.DataFrame(out)
    return df.astype(
        {"id": "int64", "width": "int64", "height": "int64", "fps": "float64",
         "n_frames": "int64", "sampled_frames": "int64",
         "y_mean": "float64", "y_std": "float64"}
    )


GOLDEN_OPS = {
    "video_features": ("documents", oracle_video_features),
    "minhash_pairs": ("documents", oracle_minhash_pairs),
    "simhash": ("documents", oracle_simhash),
    "fingerprints": ("documents", oracle_fingerprints),
    "image_features": ("documents", oracle_image_features),
    "audio_features": ("documents", oracle_audio_features),
    "ann_lsh_topk": ("embeddings", oracle_ann_lsh),
    "ann_ivf_topk": ("embeddings", oracle_ann_ivf),
    "knn_join_ivf": ("embeddings", oracle_knn_join_ivf),
    "ann_pq_topk": ("embeddings", oracle_ann_pq),
}
