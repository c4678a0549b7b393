"""Composite English/CJK tokenizer.

Semantics (parity-critical — positions drive phrase queries, token counts
drive BM25 doc length):

* Non-CJK runs: split on ``[^a-zA-Z0-9]+``, lowercase, drop tokens of length
  <= 1, optionally drop stopwords. Dropped tokens do NOT consume a position.
  (reference: text/EnglishTokenizer.java:26-63)
* CJK runs (Han/Hiragana/Katakana/Hangul): overlapping character bigrams; an
  isolated single CJK char is emitted as-is (even though length 1).
  (reference: text/BigramTokenizer.java:12-62)
* Mixed text is segmented into maximal CJK / non-CJK runs with ONE global
  position counter across segments; offsets are re-based to the original
  string. (reference: text/CompositeTokenizer.java:25-59)

Because dropped tokens never consume a position, emitted positions are always
the consecutive integers 0..n-1 — the position of a token IS its index in the
emitted sequence. The Spark build exploits this: it stores only the ordered
term sequence and derives positions for free.

Two implementations:
* :func:`tokenize` — scalar, exact, used by the oracle and golden tests.
* :func:`tokenize_batch` — vectorized over a pandas Series (the Arrow/pandas
  UDF hot path). ASCII-only batches stay entirely in pandas ``.str`` /
  C-level list ops; rows containing CJK fall back to the scalar path
  (row-at-a-time Python never touches the Spark row loop — it is inside one
  Arrow batch).
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Optional

import numpy as np
import pandas as pd

from .constants import STOPWORDS

# Approximation of Java Character.UnicodeScript HAN/HIRAGANA/KATAKANA/HANGUL
# (BigramTokenizer.java:56-62). Covers the BMP blocks + supplementary Han
# ideographs; sufficient for real-world CJK text.
_CJK_PATTERN = (
    "⺀-⻳"      # CJK radicals supplement (HAN)
    "々〇〡-〩〸-〻"  # Han punctuation-ideographs
    "ぁ-ゖゝ-ゟ"              # Hiragana
    "ァ-ヺヽ-ヿㇰ-ㇿ"  # Katakana (+ phonetic ext)
    "㐀-䶿一-鿿豈-龎"  # Han
    "ᄀ-ᇿ㄰-㆏ꥠ-ꥼ"  # Hangul jamo / compat
    "가-힣ힰ-ퟻﾠ-ￜ"  # Hangul syllables / halfwidth
    "ｦ-ﾝ"                            # halfwidth Katakana
    "\U00020000-\U0002ebe0\U0002f800-\U0002fa1d"  # Han ext B..F + compat sup
)
_CJK_RE = re.compile(f"[{_CJK_PATTERN}]")
_CJK_RUN_RE = re.compile(f"[{_CJK_PATTERN}]+")
_WORD_RE = re.compile(r"[a-zA-Z0-9]+")
_WORD_LOWER_RE = re.compile(r"[a-z0-9]+")


def _pattern_intervals(pattern: str):
    """Parse the character-class body into sorted (start, end) codepoint
    intervals — the numpy-classifiable form of _CJK_PATTERN. The class body
    uses '-' only as a range separator."""
    iv = []
    i, n = 0, len(pattern)
    while i < n:
        lo = pattern[i]
        if i + 2 < n and pattern[i + 1] == "-":
            iv.append((ord(lo), ord(pattern[i + 2])))
            i += 3
        else:
            iv.append((ord(lo), ord(lo)))
            i += 1
    iv.sort()
    return (
        np.array([a for a, _ in iv], dtype=np.uint32),
        np.array([b for _, b in iv], dtype=np.uint32),
    )


_CJK_STARTS, _CJK_ENDS = _pattern_intervals(_CJK_PATTERN)


class Token(NamedTuple):
    term: str
    position: int
    start: int
    end: int


def _is_cjk(ch: str) -> bool:
    return bool(_CJK_RE.match(ch))


def tokenize(text: Optional[str], enable_stopwords: bool = True) -> List[Token]:
    """Exact scalar composite tokenizer (CompositeTokenizer.java:25-59)."""
    if not text:
        return []
    out: List[Token] = []
    pos = 0
    i = 0
    n = len(text)
    while i < n:
        cjk = _is_cjk(text[i])
        j = i + 1
        while j < n and _is_cjk(text[j]) == cjk:
            j += 1
        if cjk:
            seg_len = j - i
            if seg_len == 1:
                out.append(Token(text[i:j], pos, i, j))
                pos += 1
            else:
                for k in range(i, j - 1):
                    out.append(Token(text[k : k + 2], pos, k, k + 2))
                    pos += 1
        else:
            for m in _WORD_RE.finditer(text, i, j):
                term = m.group().lower()
                if len(term) <= 1:
                    continue
                if enable_stopwords and term in STOPWORDS:
                    continue
                out.append(Token(term, pos, m.start(), m.end()))
                pos += 1
        i = j
    return out


def terms_only(text: Optional[str], enable_stopwords: bool = True) -> List[str]:
    """Ordered emitted term sequence (position == list index)."""
    return [t.term for t in tokenize(text, enable_stopwords)]


def _tokenize_cjk_rows(texts: List[str], stop) -> List[list]:
    """Vectorized composite tokenizer for rows CONTAINING CJK.

    Replaces the per-row scalar fallback (a per-CHARACTER Python loop) with
    batch numpy over the rows' joined codepoints: classify chars (ASCII
    word / CJK via interval bisect), run-length segment both classes, emit
    word spans + CJK bigram/single spans, order by offset, split by row.
    Per-token work is one string slice — the inherent floor, since the
    output is Python strings. Exact-equivalent to :func:`tokenize` (golden
    parity pinned in tests)."""
    joined = "\x00".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    is_word = (
        ((cp >= 48) & (cp <= 57))
        | ((cp >= 65) & (cp <= 90))
        | ((cp >= 97) & (cp <= 122))
    )
    iidx = np.searchsorted(_CJK_STARTS, cp, side="right").astype(np.int64) - 1
    is_cjk = (iidx >= 0) & (cp <= _CJK_ENDS[np.maximum(iidx, 0)])

    def runs(mask: np.ndarray):
        edged = np.empty(mask.size + 2, dtype=np.int8)
        edged[0] = edged[-1] = 0
        edged[1:-1] = mask
        d = np.diff(edged)
        return np.flatnonzero(d == 1), np.flatnonzero(d == -1)

    wstart, wend = runs(is_word)
    cstart, cend = runs(is_cjk)
    clen = cend - cstart
    multi = clen >= 2
    nbi = clen[multi] - 1  # bigrams per multi-char CJK run
    if nbi.size:
        ends = np.cumsum(nbi)
        offs = np.arange(int(ends[-1]), dtype=np.int64) - np.repeat(
            ends - nbi, nbi
        )
        bi_start = np.repeat(cstart[multi], nbi) + offs
    else:
        bi_start = np.empty(0, dtype=np.int64)
    single = cstart[~multi]
    starts = np.concatenate([wstart, bi_start, single])
    ends_all = np.concatenate([wend, bi_start + 2, single + 1])
    # kind 0 = word (lowercase + length/stopword filters), 1 = CJK span
    kinds = np.concatenate(
        [
            np.zeros(wstart.size, dtype=np.int8),
            np.ones(bi_start.size + single.size, dtype=np.int8),
        ]
    )
    order = np.argsort(starts, kind="stable")
    starts, ends_all, kinds = starts[order], ends_all[order], kinds[order]
    # row of each token: rows are joined with one '\x00' (neither word nor
    # CJK, so no run crosses a boundary)
    row_starts = np.zeros(len(texts), dtype=np.int64)
    if len(texts) > 1:
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        row_starts[1:] = np.cumsum(lens[:-1] + 1)
    row_of = np.searchsorted(row_starts, starts, side="right") - 1

    # materialize token strings WITHOUT a per-token Python loop for the CJK
    # spans (the bulk of a CJK document): a (n,2) uint32 codepoint matrix
    # viewed as '<U2' IS the bigram string array (UCS4 layout); singles via
    # '<U1'. Only word spans (variable length, need lower+filters) loop.
    n_tok = starts.size
    toks = np.empty(n_tok, dtype=object)
    keep = np.ones(n_tok, dtype=bool)
    ci = np.flatnonzero(kinds == 1)
    if ci.size:
        width = ends_all[ci] - starts[ci]
        idx2 = ci[width == 2]
        if idx2.size:
            pairs = np.empty((idx2.size, 2), dtype=np.uint32)
            pairs[:, 0] = cp[starts[idx2]]
            pairs[:, 1] = cp[starts[idx2] + 1]
            toks[idx2] = pairs.view("<U2").ravel().tolist()
        idx1 = ci[width == 1]
        if idx1.size:
            toks[idx1] = np.ascontiguousarray(cp[starts[idx1]]).view("<U1").tolist()
    for j in np.flatnonzero(kinds == 0).tolist():
        tok = joined[starts[j]: ends_all[j]].lower()
        if len(tok) <= 1 or tok in stop:
            keep[j] = False
        else:
            toks[j] = tok
    toks = toks[keep]
    row_kept = row_of[keep]
    bounds = np.searchsorted(row_kept, np.arange(len(texts) + 1))
    return [
        toks[bounds[r]: bounds[r + 1]].tolist() for r in range(len(texts))
    ]


def tokenize_batch(
    texts: pd.Series, enable_stopwords: bool = True
) -> pd.Series:
    """Vectorized batch tokenizer: Series[str] -> Series[list[str]].

    Returns, per row, the ordered emitted term sequence (positions are the
    list indices). ASCII fast path; CJK rows delegate to :func:`tokenize`.
    """
    texts = texts.fillna("")
    stop = STOPWORDS if enable_stopwords else frozenset()

    # Three lanes, exact-equivalent to the scalar tokenizer:
    # * pure-ASCII rows (the common case): lowercase-then-extract is safe —
    #   ASCII case folding is 1:1 inside [a-zA-Z0-9], nothing can merge;
    # * non-ASCII rows WITHOUT CJK: extract on the ORIGINAL text, lowercase
    #   per token — lowering first would merge tokens around characters
    #   whose lowercase maps into ASCII (U+212A KELVIN SIGN → 'k': 'aKb'
    #   must stay 'a','b' (dropped), not become 'akb');
    # * rows with CJK: the scalar composite tokenizer.
    is_ascii = texts.map(str.isascii)
    result = pd.Series(index=texts.index, dtype=object)

    def _filter(tokens: list) -> list:
        return [t for t in tokens if len(t) > 1 and t not in stop]

    fast_idx = texts.index[is_ascii]
    if len(fast_idx):
        result.loc[fast_idx] = (
            texts.loc[fast_idx].str.lower().str.findall(_WORD_LOWER_RE).map(_filter)
        )
    rest = texts.loc[~is_ascii]
    if len(rest):
        has_cjk = rest.str.contains(_CJK_RUN_RE, regex=True)

        def _safe(text: str) -> list:
            return _filter([m.group().lower() for m in _WORD_RE.finditer(text)])

        non_cjk_idx = rest.index[~has_cjk]
        if len(non_cjk_idx):
            result.loc[non_cjk_idx] = rest.loc[non_cjk_idx].map(_safe)
        cjk_idx = rest.index[has_cjk]
        if len(cjk_idx):
            # vectorized CJK lane (numpy run segmentation + strided
            # bigrams) — the old per-row scalar fallback cost per-character
            # Python for every CJK document at 100 TB
            toks = _tokenize_cjk_rows(rest.loc[cjk_idx].tolist(), stop)
            result.loc[cjk_idx] = pd.Series(toks, index=cjk_idx)
    return result


def token_counts_batch(texts: pd.Series, enable_stopwords: bool = True) -> np.ndarray:
    """Per-row emitted-token count (BM25 |D|, Document.java:56-58)."""
    return np.fromiter(
        (len(v) for v in tokenize_batch(texts, enable_stopwords)),
        dtype=np.int64,
        count=len(texts),
    )
