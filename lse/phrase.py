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

Used by the distributed per-bucket phrase kernel (lse.engine) and the local
serving tier (lse.local_exec) — the semantics and tie-breaks stay identical
across tiers because they share this function.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

TermPositions = Tuple[np.ndarray, List[np.ndarray]]  # (doc_ids sorted, per-doc positions)


def match_phrase(
    terms: Sequence[str],
    per_term: Dict[str, TermPositions],
) -> np.ndarray:
    """Sorted doc ids matching the adjacency chain.

    ``per_term[t] = (doc_ids, pos_lists)`` — doc_ids strictly increasing,
    ``pos_lists[j]`` the sorted positions of term ``t`` in ``doc_ids[j]``.
    Any blank term, or a term with no postings, yields an empty result
    (reference matchesPhraseInDoc semantics).
    """
    if not terms or any(not (t and t.strip()) for t in terms):
        return np.empty(0, dtype=np.int64)
    distinct = []
    seen = set()
    for t in terms:
        if t not in seen:
            seen.add(t)
            distinct.append(t)
    for t in distinct:
        if t not in per_term or per_term[t][0].size == 0:
            return np.empty(0, dtype=np.int64)

    # 1. candidate docs: intersect doc sets, smallest first
    by_size = sorted(distinct, key=lambda t: per_term[t][0].size)
    cand = per_term[by_size[0]][0]
    for t in by_size[1:]:
        cand = np.intersect1d(cand, per_term[t][0], assume_unique=True)
        if cand.size == 0:
            return cand
    n_terms = len(terms)

    def packed_keys(term: str, shift: int) -> np.ndarray:
        """int64 keys (cand_index << 32 | pos - shift + n_terms) for the
        term's positions restricted to candidate docs."""
        ids, plists = per_term[term]
        # indices of candidate docs within this term's doc array
        ti = np.searchsorted(ids, cand)
        counts = np.fromiter(
            (plists[j].size for j in ti), dtype=np.int64, count=cand.size
        )
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64)
        flat = np.concatenate([plists[j] for j in ti]).astype(np.int64)
        cidx = np.repeat(np.arange(cand.size, dtype=np.int64), counts)
        return (cidx << np.int64(32)) | (flat - shift + n_terms)

    running = packed_keys(terms[0], 0)
    for i, t in enumerate(terms[1:], start=1):
        if running.size == 0:
            return np.empty(0, dtype=np.int64)
        keys_i = packed_keys(t, i)
        running = running[np.isin(running, keys_i, assume_unique=False)]
    if running.size == 0:
        return np.empty(0, dtype=np.int64)
    matched_idx = np.unique(running >> np.int64(32))
    return cand[matched_idx]


def merge_shards(
    shards: List[Tuple[np.ndarray, List[np.ndarray]]],
) -> TermPositions:
    """Merge per-(segment) decoded position shards of ONE term into a single
    (doc_ids, pos_lists) sorted by doc id. Shards are disjoint in doc space
    (a doc lives in exactly one segment)."""
    if not shards:
        return np.empty(0, dtype=np.int64), []
    if len(shards) == 1:
        return shards[0]
    ids = np.concatenate([s[0] for s in shards])
    plists: List[np.ndarray] = []
    for s in shards:
        plists.extend(s[1])
    order = np.argsort(ids, kind="stable")
    return ids[order], [plists[i] for i in order]


def filter_tombstones(
    tp: TermPositions, tomb: np.ndarray
) -> TermPositions:
    """Drop tombstoned docs from a (doc_ids, pos_lists) pair."""
    ids, plists = tp
    if tomb.size == 0 or ids.size == 0:
        return tp
    live = ~np.isin(ids, tomb)
    if live.all():
        return tp
    keep = np.flatnonzero(live)
    return ids[keep], [plists[i] for i in keep]
