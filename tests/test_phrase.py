"""lse.phrase unit tests: the vectorized adjacency matcher must agree with
a naive per-doc transcription of the reference's expected-set intersection
(QueryEngine.java:309-341) on random corpora, plus golden edge cases."""

import numpy as np
import pytest

from lse.phrase import filter_tombstones, match_phrase, merge_shards


def build_per_term(docs: dict):
    """docs: doc_id → list of terms (position == index) → flat TermPositions."""
    per_term = {}
    for doc_id, toks in docs.items():
        for i, t in enumerate(toks):
            per_term.setdefault(t, {}).setdefault(doc_id, []).append(i)
    out = {}
    for t, m in per_term.items():
        ids = np.array(sorted(m), dtype=np.int64)
        counts = np.array([len(m[d]) for d in ids], dtype=np.int64)
        flat = np.array(
            [p for d in ids for p in m[d]], dtype=np.int64
        ) if counts.sum() else np.empty(0, dtype=np.int64)
        out[t] = (ids, counts, flat)
    return out


def naive_match(terms, docs):
    """Reference transcription: iterated expected-position-set intersection."""
    out = []
    for doc_id, toks in docs.items():
        pos = {}
        for i, t in enumerate(toks):
            pos.setdefault(t, []).append(i)
        if any(t not in pos for t in terms):
            continue
        expected = None
        ok = True
        for t in terms:
            plist = pos[t]
            if expected is None:
                expected = {p + 1 for p in plist}
                continue
            expected = {p + 1 for p in plist if p in expected}
            if not expected:
                ok = False
                break
        if ok:
            out.append(doc_id)
    return sorted(out)


def test_simple_adjacency():
    docs = {
        1: ["distributed", "system", "architecture"],
        2: ["system", "distributed", "design"],
        3: ["the", "distributed", "system"],
    }
    pt = build_per_term(docs)
    assert match_phrase(["distributed", "system"], pt).tolist() == [1, 3]
    assert match_phrase(["system", "distributed"], pt).tolist() == [2]


def test_three_terms_and_missing_term():
    docs = {1: ["a", "b", "c"], 2: ["a", "b", "x", "c"], 3: ["b", "c", "a"]}
    pt = build_per_term(docs)
    assert match_phrase(["a", "b", "c"], pt).tolist() == [1]
    assert match_phrase(["a", "zz"], pt).size == 0


def test_repeated_term_phrase():
    docs = {1: ["java", "java", "rocks"], 2: ["java", "rocks", "java"]}
    pt = build_per_term(docs)
    assert match_phrase(["java", "java"], pt).tolist() == [1]


def test_blank_term_rejected():
    docs = {1: ["a", "b"]}
    pt = build_per_term(docs)
    assert match_phrase(["a", " "], pt).size == 0
    assert match_phrase([], pt).size == 0


@pytest.mark.parametrize("seed", range(6))
def test_random_vs_naive(seed):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(8)]
    docs = {
        int(d): [vocab[i] for i in rng.integers(0, len(vocab), size=rng.integers(1, 40))]
        for d in rng.choice(10_000, size=60, replace=False)
    }
    pt = build_per_term(docs)
    for _ in range(25):
        k = int(rng.integers(1, 4))
        phrase = [vocab[i] for i in rng.integers(0, len(vocab), size=k)]
        got = match_phrase(phrase, pt).tolist()
        want = naive_match(phrase, docs)
        assert got == want, (phrase, got, want)


def test_merge_shards_and_tombstones():
    a = (
        np.array([1, 5], dtype=np.int64),
        np.array([1, 2], dtype=np.int64),
        np.array([0, 2, 3], dtype=np.int64),
    )
    b = (
        np.array([3], dtype=np.int64),
        np.array([1], dtype=np.int64),
        np.array([7], dtype=np.int64),
    )
    ids, counts, flat = merge_shards([a, b])
    assert ids.tolist() == [1, 3, 5]
    assert counts.tolist() == [1, 1, 2]
    assert flat.tolist() == [0, 7, 2, 3]
    ids2, counts2, flat2 = filter_tombstones(
        (ids, counts, flat), np.array([3], dtype=np.int64)
    )
    assert ids2.tolist() == [1, 5]
    assert counts2.tolist() == [1, 2]
    assert flat2.tolist() == [0, 2, 3]


# ------------------------------------------- rank-key fast path parity
def _random_positions(rng, n_docs_universe, n_terms=3, max_docs=40, max_pos=30):
    """Random TermPositions dict over a random sorted doc universe."""
    import numpy as np

    universe = np.sort(
        rng.choice(10_000, size=n_docs_universe, replace=False).astype(np.int64)
    )
    per_term = {}
    for ti in range(n_terms):
        nd = int(rng.integers(0, max_docs))
        docs = np.sort(rng.choice(universe, size=min(nd, universe.size), replace=False))
        counts = rng.integers(1, 6, size=docs.size).astype(np.int64)
        flat = np.concatenate(
            [
                np.sort(rng.choice(max_pos, size=c, replace=False)).astype(np.int64)
                for c in counts
            ]
        ) if docs.size else np.empty(0, dtype=np.int64)
        per_term[f"t{ti}"] = (docs.astype(np.int64), counts, flat)
    return universe, per_term


def test_match_phrase_ranked_parity_random():
    """match_phrase_ranked over prebuilt rank keys must equal match_phrase
    on 300 random corpora × random phrase shapes (incl. repeated terms and
    docs absent from the universe)."""
    import numpy as np

    from lse.phrase import match_phrase, match_phrase_ranked, rank_keys

    rng = np.random.default_rng(20260817)
    for trial in range(300):
        universe, per_term = _random_positions(
            rng, n_docs_universe=int(rng.integers(5, 60))
        )
        names = list(per_term)
        k = int(rng.integers(2, 4))
        phrase = [names[int(rng.integers(0, len(names)))] for _ in range(k)]
        expect = match_phrase(phrase, per_term)
        keys_of = {t: rank_keys(per_term[t], universe) for t in set(phrase)}
        got = match_phrase_ranked(phrase, keys_of, universe)
        np.testing.assert_array_equal(got, expect, err_msg=f"trial {trial}: {phrase}")


def test_rank_keys_drops_docs_outside_universe():
    """Docs missing from all_ids (tombstoned) must vanish from the keys —
    and a phrase whose only match is such a doc returns empty."""
    import numpy as np

    from lse.phrase import match_phrase_ranked, rank_keys

    universe = np.array([10, 30], dtype=np.int64)
    tp_a = (np.array([10, 20], dtype=np.int64), np.array([1, 1], dtype=np.int64),
            np.array([0, 5], dtype=np.int64))
    tp_b = (np.array([10, 20], dtype=np.int64), np.array([1, 1], dtype=np.int64),
            np.array([1, 6], dtype=np.int64))
    ka, kb = rank_keys(tp_a, universe), rank_keys(tp_b, universe)
    assert ka.size == 1 and kb.size == 1  # doc 20 dropped
    got = match_phrase_ranked(["a", "b"], {"a": ka, "b": kb}, universe)
    np.testing.assert_array_equal(got, np.array([10], dtype=np.int64))
