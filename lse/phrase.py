"""Vectorized phrase-adjacency matching (numpy, no per-doc Python loops).

Reference semantics (query/QueryEngine.java:309-341): a phrase matches a doc
iff every term is present and there is a position chain
``pos_{i+1} = pos_i + 1`` across the phrase terms. The reference checks this
per candidate doc with iterated expected-set intersections; here the whole
candidate set is checked at once:

1. candidate docs = intersection of the terms' doc-id sets (smallest first);
2. per phrase slot i, every (doc, position - i) pair is packed into one
   int64 key ``doc_index << 32 | (position - i + slot_offset)``;
3. the running key set is intersected across slots — survivors are docs
   where some start position p0 has term_i at p0 + i for all i.

A term repeated in the phrase works naturally: its keys are packed once per
slot with that slot's shift. Complexity is O(total candidate positions),
all inside numpy.

Positions are held FLAT — ``TermPositions = (doc_ids, counts, flat)`` where
``flat[start_j : start_j + counts[j]]`` are doc ``doc_ids[j]``'s sorted
positions (the layout ``codec.decode_positions_flat`` produces). Per-doc
selection is a vectorized segment gather, never a list of per-doc arrays.

Used by the distributed per-bucket phrase kernels (lse.engine) and the local
serving tier (lse.local_exec) — the semantics and tie-breaks stay identical
across tiers because they share this module.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# (doc_ids sorted, per-doc position counts, flat concatenated positions)
TermPositions = Tuple[np.ndarray, np.ndarray, np.ndarray]

_EMPTY = np.empty(0, dtype=np.int64)


def empty_positions() -> TermPositions:
    return _EMPTY, _EMPTY, _EMPTY


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), … concatenated — intra-segment offsets."""
    total = int(counts.sum())
    if total == 0:
        return _EMPTY
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def segment_gather(
    counts: np.ndarray, flat: np.ndarray, sel: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Select segments ``sel`` (indices into the doc axis) →
    (sel_counts, sel_flat)."""
    starts = np.cumsum(counts) - counts
    sel_counts = counts[sel]
    idx = np.repeat(starts[sel], sel_counts) + _ranges(sel_counts)
    return sel_counts, flat[idx]


def match_phrase(
    terms: Sequence[str],
    per_term: Dict[str, TermPositions],
) -> np.ndarray:
    """Sorted doc ids matching the adjacency chain.

    Any blank term, or a term with no postings, yields an empty result
    (reference matchesPhraseInDoc semantics).
    """
    if not terms or any(not (t and t.strip()) for t in terms):
        return _EMPTY
    distinct: List[str] = []
    seen = set()
    for t in terms:
        if t not in seen:
            seen.add(t)
            distinct.append(t)
    for t in distinct:
        if t not in per_term or per_term[t][0].size == 0:
            return _EMPTY

    # 1. candidate docs: intersect doc sets, smallest first (binary-search
    # membership — both sides are sorted-unique, no concat-and-sort)
    from .ids import member_mask

    by_size = sorted(distinct, key=lambda t: per_term[t][0].size)
    cand = per_term[by_size[0]][0]
    for t in by_size[1:]:
        cand = cand[member_mask(cand, per_term[t][0])]
        if cand.size == 0:
            return cand
    n_terms = len(terms)

    def packed_keys(term: str, shift: int) -> np.ndarray:
        ids, counts, flat = per_term[term]
        sel = np.searchsorted(ids, cand)
        sel_counts, sel_flat = segment_gather(counts, flat, sel)
        if sel_flat.size == 0:
            return _EMPTY
        cidx = np.repeat(np.arange(cand.size, dtype=np.int64), sel_counts)
        return (cidx << np.int64(32)) | (sel_flat - shift + n_terms)

    # packed keys are STRICTLY ascending by construction (docs ascend, and
    # positions strictly ascend within a doc), so slot intersection is a
    # binary-search membership test, not np.isin's internal sort — with the
    # SMALLER array as the needles (min(n,m)·log max(n,m): a rare term
    # chained against a hot one pays the rare side's length); the final
    # doc extraction dedupes a sorted array with one neighbor compare
    def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        small, big = (a, b) if a.size <= b.size else (b, a)
        return small[member_mask(small, big)]

    # slots are intersected RAREST-FIRST (by total position count — the
    # reference seeds from its first term's postings, we seed from the
    # cheapest): the running key set shrinks to near the final match count
    # after one step, so every later intersection binary-searches a small
    # needle array into the big term instead of materializing large
    # intermediates. Set-intersection is commutative — result identical.
    slot_order = sorted(
        range(n_terms), key=lambda i: per_term[terms[i]][2].size
    )
    running = packed_keys(terms[slot_order[0]], slot_order[0])
    for i in slot_order[1:]:
        if running.size == 0:
            return _EMPTY
        running = _intersect_sorted(running, packed_keys(terms[i], i))
    if running.size == 0:
        return _EMPTY
    docs = running >> np.int64(32)
    first = np.ones(docs.size, dtype=bool)
    first[1:] = docs[1:] != docs[:-1]
    return cand[docs[first]]


def rank_keys(tp: TermPositions, all_ids: np.ndarray) -> np.ndarray:
    """Per-TERM packed adjacency keys over the GLOBAL sorted doc universe:
    ``(doc_rank << 32) + position``, strictly ascending.

    The point (vs :func:`match_phrase`'s per-query ``packed_keys``): doc
    ranks come from ``all_ids`` — a universe shared by every term — so the
    slot shift of a phrase reduces to a SCALAR offset on this array
    (``key + (n_terms - slot)``), and the array itself depends only on the
    term. One build per term serves every phrase that uses the term
    (:class:`lse.local_exec.LocalExecutor` caches it in an LRU), turning
    the per-query adjacency kernel into sorted-array intersections.

    Docs absent from ``all_ids`` (e.g. tombstoned docs in an unfiltered
    positions decode) are dropped — they could never survive the
    live-postings filter downstream anyway."""
    ids, counts, flat = tp
    if ids.size == 0 or all_ids.size == 0:
        return _EMPTY
    rank = np.searchsorted(all_ids, ids)
    np.minimum(rank, all_ids.size - 1, out=rank)
    valid = all_ids[rank] == ids
    if not valid.all():
        _ids, counts, flat = filter_docs(tp, valid)
        rank = rank[valid]
    if flat.size == 0:
        return _EMPTY
    return np.repeat(rank << np.int64(32), counts) + flat


def match_phrase_ranked(
    terms: Sequence[str],
    keys_of: Dict[str, np.ndarray],
    all_ids: np.ndarray,
) -> np.ndarray:
    """Adjacency match over prebuilt :func:`rank_keys` arrays → sorted doc
    ids. Exactly :func:`match_phrase`'s semantics (pinned by parity tests);
    the per-slot work is one scalar-offset add + one binary-search
    membership pass, so a phrase over key-cached terms costs
    O(min_slot_size · log max_slot_size) instead of rebuilding packed keys
    per query."""
    from .ids import member_mask

    if not terms or any(not (t and t.strip()) for t in terms):
        return _EMPTY
    for t in set(terms):
        if t not in keys_of or keys_of[t].size == 0:
            return _EMPTY
    n = len(terms)
    slot_order = sorted(range(n), key=lambda i: keys_of[terms[i]].size)
    i0 = slot_order[0]
    # running set lives in the value space "position + n - slot" of slot i0
    running = keys_of[terms[i0]] + np.int64(n - i0)
    for i in slot_order[1:]:
        if running.size == 0:
            return _EMPTY
        keys = keys_of[terms[i]]
        off = np.int64(n - i)
        if keys.size < running.size:
            shifted = keys + off
            running = shifted[member_mask(shifted, running)]
        else:
            running = running[member_mask(running - off, keys)]
    if running.size == 0:
        return _EMPTY
    ranks = running >> np.int64(32)
    first = np.ones(ranks.size, dtype=bool)
    first[1:] = ranks[1:] != ranks[:-1]
    return all_ids[ranks[first]]


def merge_shards(shards: List[TermPositions]) -> TermPositions:
    """Merge per-(segment/bucket) decoded position shards of ONE term into a
    single flat TermPositions sorted by doc id.

    Fast path: buckets are fixed doc-id RANGES, so a single segment's
    shards never interleave — ordering the shards by first doc id and
    concatenating is the whole merge (O(total) memcpy, no per-element
    argsort/gather). Shards from DELTA segments can interleave with the
    base in doc space; the range check detects that and falls back to the
    element-wise stable sort."""
    shards = [s for s in shards if s[0].size]
    if not shards:
        return empty_positions()
    if len(shards) == 1:
        return shards[0]
    shards.sort(key=lambda s: int(s[0][0]))
    disjoint = all(
        int(shards[i][0][-1]) < int(shards[i + 1][0][0])
        for i in range(len(shards) - 1)
    )
    ids = np.concatenate([s[0] for s in shards])
    counts = np.concatenate([s[1] for s in shards])
    flat = np.concatenate([s[2] for s in shards])
    if disjoint:
        return ids, counts, flat
    order = np.argsort(ids, kind="stable")
    sel_counts, sel_flat = segment_gather(counts, flat, order)
    return ids[order], sel_counts, sel_flat


def filter_docs(tp: TermPositions, keep_mask: np.ndarray) -> TermPositions:
    ids, counts, flat = tp
    if keep_mask.all():
        return tp
    keep = np.flatnonzero(keep_mask)
    sel_counts, sel_flat = segment_gather(counts, flat, keep)
    return ids[keep], sel_counts, sel_flat


def filter_tombstones(tp: TermPositions, tomb: np.ndarray) -> TermPositions:
    """Drop tombstoned docs from a TermPositions triple (tomb is sorted)."""
    from .ids import member_mask

    ids = tp[0]
    if tomb.size == 0 or ids.size == 0:
        return tp
    return filter_docs(tp, ~member_mask(ids, tomb))


def restrict_ids(tp: TermPositions, allowed_sorted: np.ndarray) -> TermPositions:
    """Keep only docs present in ``allowed_sorted``."""
    from .ids import member_mask

    ids = tp[0]
    if ids.size == 0:
        return tp
    return filter_docs(tp, member_mask(ids, allowed_sorted))
