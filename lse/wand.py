"""Block-max WAND top-k scoring kernel (numpy, document-at-a-time).

The reference reads whole posting lists and scores every posting
(query/QueryEngine.java:211-242); its skip lists
(storage/PostingsWriter.java:48-60) exist but are never used for pruning.
Here each 128-doc block carries an exact per-block upper bound of the
idf-free BM25 component (codec.encode_postings), so WAND can

* pick a pivot from per-term global upper bounds,
* verify the pivot against the SUM OF BLOCK maxima before decoding,
* skip whole blocks without ever touching their bytes.

Exactness: pruning uses ``upper_bound <= threshold`` which is rank-safe under
the engine-wide tie-break (score desc, doc_id asc) because docs are visited
in increasing doc_id order — an incumbent heap entry with equal score always
has a smaller doc_id and therefore wins the tie. Tests assert WAND returns
EXACTLY the exhaustive scorer's top-k.
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .bm25 import idf as idf_fn
from .codec import decode_block, decode_postings, raw_bm25_component
from .constants import BLOCK_INTERVAL, BM25_B, BM25_K1


class TermCursor:
    """Lazy block-decoding cursor over one encoded posting shard."""

    __slots__ = (
        "payload", "block_last", "block_off", "block_max", "df_shard",
        "idf", "n_blocks", "bi", "ids", "tfs", "dls", "pos", "exhausted",
        "loaded", "_pend", "_sufmax",
    )

    def __init__(self, payload: bytes, block_last, block_off, block_max,
                 df_shard: int, idf: float):
        self.payload = payload
        self.block_last = np.asarray(block_last, dtype=np.int64)
        self.block_off = np.asarray(block_off, dtype=np.int64)
        self.block_max = np.asarray(block_max, dtype=np.float64)
        self.df_shard = int(df_shard)
        self.idf = float(idf)
        self.n_blocks = len(self.block_last)
        self.bi = -1
        self.ids = self.tfs = self.dls = None
        self.pos = 0
        self.loaded = False
        self._pend = 0  # pending seek target while lazily positioned
        self._sufmax = None  # lazy suffix-max over block_max (skip scans)
        self.exhausted = self.df_shard == 0
        if not self.exhausted:
            self._load_block(0)

    # ------------------------------------------------------------ internals
    def _block_count(self, bi: int) -> int:
        if bi < self.n_blocks - 1:
            return BLOCK_INTERVAL
        return self.df_shard - bi * BLOCK_INTERVAL

    def _load_block(self, bi: int) -> None:
        prev_last = int(self.block_last[bi - 1]) if bi > 0 else 0
        self.ids, self.tfs, self.dls = decode_block(
            self.payload, int(self.block_off[bi]), self._block_count(bi), prev_last
        )
        self.bi = bi
        self.pos = 0
        self.loaded = True

    # ---------------------------------------------- lazy (no-decode) seeks
    def seek_lazy(self, target: int) -> None:
        """Position to the block holding the first doc >= target WITHOUT
        decoding it — a block-max-pruned skip must never touch the block's
        bytes. The decode happens in :meth:`ensure_loaded` only if a later
        range actually scores this block."""
        if self.exhausted:
            return
        if self.loaded and self.cur_doc() >= target:
            return
        if self.bi >= 0 and target <= self.block_last[self.bi]:
            if not self.loaded:
                self._pend = max(self._pend, target)
                return
            self.pos = int(np.searchsorted(self.ids, target, side="left"))
            return
        nxt = int(np.searchsorted(self.block_last, target, side="left"))
        if nxt >= self.n_blocks:
            self.exhausted = True
            return
        self.bi = nxt
        self.loaded = False
        self._pend = target

    def ensure_loaded(self) -> None:
        if self.loaded or self.exhausted:
            return
        pend = self._pend
        self._load_block(self.bi)
        self.pos = int(np.searchsorted(self.ids, pend, side="left"))

    def cur_doc_lb(self) -> int:
        """Exact current doc when loaded; a LOWER bound (never above the
        true value) when lazily positioned — safe for the bulk kernel's
        `cur_doc <= end` test (it can only ADD a cursor's bound to ub)."""
        if self.loaded:
            return int(self.ids[self.pos])
        lo = int(self.block_last[self.bi - 1]) + 1 if self.bi > 0 else 0
        return max(lo, self._pend)

    def next_strong_block(self, raw_bound: float) -> Optional[int]:
        """First block index > bi whose raw block max exceeds ``raw_bound``
        — the earliest point this cursor ALONE could change a prune
        verdict. None if no later block qualifies. O(1) for flat tails via
        a lazily-built suffix max; chunked scan otherwise (the hit is
        typically nearby)."""
        j = self.bi + 1
        n = self.n_blocks
        if j >= n:
            return None
        if self._sufmax is None:
            self._sufmax = np.maximum.accumulate(self.block_max[::-1])[::-1]
        if self._sufmax[j] <= raw_bound:
            return None  # no later block can beat the bound
        step = 512
        while j < n:
            hi = min(j + step, n)
            strong = self.block_max[j:hi] > raw_bound
            if strong.any():
                return j + int(np.argmax(strong))
            j = hi
        return None  # pragma: no cover — sufmax guarantees a hit above

    # -------------------------------------------------------------- queries
    @property
    def max_score(self) -> float:
        return self.idf * float(self.block_max.max()) if self.n_blocks else 0.0

    def cur_doc(self) -> int:
        return int(self.ids[self.pos])

    def cur_block_max_score(self) -> float:
        return self.idf * float(self.block_max[self.bi])

    def cur_block_last(self) -> int:
        return int(self.block_last[self.bi])

    def score_current(self, avgdl: float) -> float:
        tf = float(self.tfs[self.pos])
        dl = max(float(self.dls[self.pos]), 0.0)
        safe_avgdl = avgdl if avgdl > 0 else 1.0
        norm = 1.0 - BM25_B + BM25_B * (dl / safe_avgdl)
        return self.idf * (tf * (BM25_K1 + 1.0)) / (tf + BM25_K1 * norm)

    # ------------------------------------------------------------- movement
    def advance(self) -> None:
        self.pos += 1
        if self.pos >= len(self.ids):
            if self.bi + 1 >= self.n_blocks:
                self.exhausted = True
            else:
                self._load_block(self.bi + 1)

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target (block-skipping)."""
        if self.exhausted or self.cur_doc() >= target:
            return
        if self.block_last[self.bi] < target:
            nxt = int(np.searchsorted(self.block_last, target, side="left"))
            if nxt >= self.n_blocks:
                self.exhausted = True
                return
            self._load_block(nxt)
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos >= len(self.ids):  # can't happen if block_last correct
            self.advance()

    def skip_past_block(self) -> None:
        """Jump past the current block (block-max pruned)."""
        if self.bi + 1 >= self.n_blocks:
            self.exhausted = True
        else:
            self._load_block(self.bi + 1)


class TopK:
    """Bounded heap with (score desc, doc_id asc) selection order."""

    def __init__(self, k: int):
        self.k = k
        self.heap: List[Tuple[float, int]] = []  # (score, -doc_id) min-heap

    def threshold(self) -> float:
        return self.heap[0][0] if len(self.heap) >= self.k else float("-inf")

    def offer(self, doc_id: int, score: float) -> None:
        key = (score, -doc_id)
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, key)
        elif key > self.heap[0]:
            heapq.heapreplace(self.heap, key)

    def items(self) -> List[Tuple[int, float]]:
        out = [(-nd, s) for s, nd in self.heap]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out


def wand_topk(
    cursors: Sequence[TermCursor],
    k: int,
    avgdl: float,
    initial_threshold: float = float("-inf"),
) -> List[Tuple[int, float]]:
    """Exact top-k over the OR of the given term cursors (score = sum).

    TEST ORACLE ONLY — the textbook per-posting document-at-a-time WAND
    loop, kept as the independent cross-check for the production
    ``wand_topk_bulk`` range-bulk kernel (tests/test_wand.py). No
    production code path reaches it: SearchEngine routes OR top-k to the
    bulk kernel or the bucket tier exclusively."""
    if k <= 0:
        return []
    top = TopK(k)
    live = [c for c in cursors if not c.exhausted]
    while live:
        live = [c for c in live if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc())
        theta = max(top.threshold(), initial_threshold)
        # pivot: first prefix whose summed term upper bounds exceed theta
        acc = 0.0
        pivot_idx: Optional[int] = None
        for i, c in enumerate(live):
            acc += c.max_score
            if acc > theta:
                pivot_idx = i
                break
        if pivot_idx is None:
            break  # not even the full sum can beat theta
        pivot_doc = live[pivot_idx].cur_doc()
        # extend the prefix over every cursor positioned at the pivot doc —
        # their mass must be part of the block-max bound
        ext = pivot_idx
        while ext + 1 < len(live) and live[ext + 1].cur_doc() <= pivot_doc:
            ext += 1
        if live[0].cur_doc() == pivot_doc:
            # shallow-align each prefix cursor's block AT the pivot doc (no
            # decode) and sum those blocks' maxima — the BMW refinement
            block_ub = 0.0
            boundary: Optional[int] = None
            for c in live[: ext + 1]:
                j = int(np.searchsorted(c.block_last, pivot_doc, side="left"))
                if j >= c.n_blocks:
                    continue  # cursor has no postings at/after the pivot
                block_ub += c.idf * float(c.block_max[j])
                bl = int(c.block_last[j])
                boundary = bl if boundary is None else min(boundary, bl)
            if block_ub <= theta:
                # prune: jump past the nearest block boundary, but never past
                # the next doc of a cursor outside the prefix (its mass was
                # not counted in the bound)
                d = (boundary if boundary is not None else pivot_doc) + 1
                if ext + 1 < len(live):
                    d = min(d, live[ext + 1].cur_doc())
                for c in live[: ext + 1]:
                    if not c.exhausted and c.cur_doc() < d:
                        c.seek(d)
                continue
            score = 0.0
            for c in live[: ext + 1]:
                if not c.exhausted and c.cur_doc() == pivot_doc:
                    score += c.score_current(avgdl)
            top.offer(pivot_doc, score)
            for c in live[: ext + 1]:
                if not c.exhausted and c.cur_doc() == pivot_doc:
                    c.advance()
        else:
            for c in live[:pivot_idx]:
                if not c.exhausted and c.cur_doc() < pivot_doc:
                    c.seek(pivot_doc)
    return top.items()


def wand_topk_and(
    cursors: Sequence[TermCursor],
    k: int,
    avgdl: float,
) -> List[Tuple[int, float]]:
    """Exact top-k over the AND of the given term cursors (doc must appear
    in every cursor; score = sum). Document-at-a-time intersection seeded by
    cursor alignment with block-skipping seeks, plus the block-max bound to
    skip aligned regions that cannot beat the current threshold."""
    if k <= 0:
        return []
    top = TopK(k)
    if not cursors or any(c.exhausted for c in cursors):
        return []
    while True:
        d = max(c.cur_doc() for c in cursors)
        aligned = True
        for c in cursors:
            if c.cur_doc() < d:
                c.seek(d)
                if c.exhausted:
                    return top.items()
                if c.cur_doc() > d:
                    aligned = False
        if not aligned:
            continue
        theta = top.threshold()
        if theta != float("-inf"):
            ub = sum(c.cur_block_max_score() for c in cursors)
            if ub <= theta:
                # skip past the nearest block boundary among all terms
                boundary = min(c.cur_block_last() for c in cursors)
                for c in cursors:
                    c.seek(boundary + 1)
                    if c.exhausted:
                        return top.items()
                continue
        top.offer(d, sum(c.score_current(avgdl) for c in cursors))
        for c in cursors:
            c.advance()
            if c.exhausted:
                return top.items()


def wand_topk_bulk(
    cursors: Sequence[TermCursor],
    k: int,
    avgdl: float,
) -> List[Tuple[int, float]]:
    """Exact disjunctive top-k with block-max pruning at RANGE granularity.

    Classic WAND advances one document per iteration in Python; this kernel
    advances one BLOCK-ALIGNED RANGE per iteration: the range
    ``[min cur_doc, min current-block last]`` is either skipped whole (the
    summed per-block upper bounds cannot beat the running threshold — no
    bytes of it are ever decoded) or scored whole in vectorized numpy and
    bulk-merged into the top-k arrays. Same pruning invariant as block-max
    WAND (a range is only skipped when its upper bound ≤ θ), so the result
    is exactly the exhaustive scorer's top-k; iterations scale with the
    number of block-bound CHANGE POINTS, not with document count: a pruned
    skip jumps in ONE iteration to the nearest place the verdict could flip
    (an idle cursor's next doc, or a counted cursor's next block whose own
    bound exceeds its θ-share) — and skipped blocks are never decoded
    (TermCursor.seek_lazy)."""
    if k <= 0:
        # search_topk clamps limit to >= 0, so limit=0 reaches the kernel —
        # without the guard top_scores.min() below raises on the empty array
        return []
    live = [c for c in cursors if not c.exhausted]
    top_ids = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float64)
    theta = float("-inf")
    while live:
        end = min(c.cur_block_last() for c in live)
        counted = [c for c in live if c.cur_doc_lb() <= end]
        ub = sum(c.cur_block_max_score() for c in counted)
        if ub <= theta:
            # the whole range [.., end] is pruned; jump as far as provably
            # safe. Soundness: grant each counted cursor an equal share of
            # the remaining slack (θ - ub) on top of its CURRENT block
            # bound — then for ANY subrange before the target, participants
            # are a subset of `counted` (we never pass an idle cursor's
            # next doc), each in a block bounded by bound_c + slack/|C|, so
            # Σ ≤ ub + slack = θ and the subrange is pruned too.
            targets = [c.cur_doc_lb() for c in live if c.cur_doc_lb() > end]
            per = (theta - ub) / len(counted)
            for c in counted:
                raw_allow = (
                    c.block_max[c.bi] + per / c.idf
                    if c.idf > 0
                    else float("inf")
                )
                nb = c.next_strong_block(raw_allow)
                if nb is None:
                    targets.append(int(c.block_last[-1]) + 1)
                else:
                    targets.append(int(c.block_last[nb - 1]) + 1)
            target = max(end + 1, min(targets))
            nxt = []
            for c in live:
                c.seek_lazy(target)
                if not c.exhausted:
                    nxt.append(c)
            live = nxt
            continue
        parts_i: List[np.ndarray] = []
        parts_s: List[np.ndarray] = []
        nxt = []
        for c in live:
            if c.cur_doc_lb() > end:
                nxt.append(c)  # idle here — do not decode or advance
                continue
            c.ensure_loaded()
            lo = c.pos
            hi = int(np.searchsorted(c.ids, end, side="right"))
            if hi > lo:
                ids = c.ids[lo:hi]
                parts_i.append(ids)
                parts_s.append(
                    c.idf
                    * raw_bm25_component(c.tfs[lo:hi], c.dls[lo:hi], avgdl)
                )
            c.pos = hi
            if hi >= len(c.ids):
                if c.bi + 1 >= c.n_blocks:
                    c.exhausted = True
                else:
                    c._load_block(c.bi + 1)
            if not c.exhausted:
                nxt.append(c)
        live = nxt
        if not parts_i:
            continue
        if len(parts_i) == 1:
            # one cursor contributed — already sorted-unique, no merge
            uniq, summed = parts_i[0], parts_s[0]
        else:
            allids = np.concatenate(parts_i)
            uniq, inv = np.unique(allids, return_inverse=True)
            summed = np.zeros(uniq.size)
            np.add.at(summed, inv, np.concatenate(parts_s))
        top_ids = np.concatenate([top_ids, uniq])
        top_scores = np.concatenate([top_scores, summed])
        # compress lazily: θ from the last compression is a LOWER bound on
        # the true k-th best (sound — pruning is merely less eager between
        # compressions), so the O(m log m) select runs per ~2k candidates,
        # not per range
        if top_ids.size >= 2048:
            order = np.lexsort((top_ids, -top_scores))[:k]
            top_ids, top_scores = top_ids[order], top_scores[order]
            if top_ids.size >= k:
                theta = float(top_scores.min())
        elif theta == float("-inf") and top_ids.size >= k:
            order = np.lexsort((top_ids, -top_scores))[:k]
            top_ids, top_scores = top_ids[order], top_scores[order]
            theta = float(top_scores.min())
    order = np.lexsort((top_ids, -top_scores))[:k]
    return [(int(top_ids[i]), float(top_scores[i])) for i in order]


def exhaustive_scores(
    term_rows: Dict[str, list],
    n_docs: int,
    avgdl: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fully-vectorized exhaustive OR scoring over decoded postings.

    ``term_rows``: term → list of (payload, df_shard, df_global) shards.
    Returns (doc_ids, scores) for every matching doc.
    """
    all_ids: List[np.ndarray] = []
    all_scores: List[np.ndarray] = []
    for _term, shards in term_rows.items():
        if not shards:
            continue
        df_global = int(shards[0][2])
        idf_v = idf_fn(df_global, n_docs)
        for payload, df_shard, _dfg in shards:
            ids, tfs, dls = decode_postings(payload, int(df_shard))
            raw = raw_bm25_component(tfs, dls, avgdl)
            all_ids.append(ids)
            all_scores.append(idf_v * raw)
    if not all_ids:
        return np.empty(0, dtype=np.int64), np.empty(0)
    ids = np.concatenate(all_ids)
    scores = np.concatenate(all_scores)
    uniq, inverse = np.unique(ids, return_inverse=True)
    summed = np.zeros(len(uniq))
    np.add.at(summed, inverse, scores)
    return uniq, summed


def topk_from_scores(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> List[Tuple[int, float]]:
    if doc_ids.size == 0 or k <= 0:
        return []
    order = np.lexsort((doc_ids, -scores))[:k]
    return [(int(doc_ids[i]), float(scores[i])) for i in order]
