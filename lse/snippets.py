"""Snippet generation with term highlighting.

Exact port of the reference's highlight/SnippetGenerator.java semantics:

* hits = case-insensitive substring occurrences of each query term
  (SnippetGenerator.java:76-92), overlapping spans merged (:168-189);
* each hit expands to a ±80-char window, ends aligned outward to word
  boundaries (letter/digit/underscore, :139-157);
* overlapping windows merge, accumulating hit counts (:95-120);
* windows ranked by hit count desc then start asc; top 3 kept (:39-41);
* highlight via ANSI bold-yellow spans (:191-213);
* line number = 1 + count of '\n' before the first highlight (:159-166).

Applied only to the top-k result rows (k ≤ 1000), so this runs driver-side
over collected rows or, in bulk mode, as a pandas UDF over a joined
(doc_id, content) frame — it is never in the scoring hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Tuple

from .constants import MAX_SNIPPETS, SNIPPET_CONTEXT_CHARS

ANSI_HIGHLIGHT = "\x1b[1;33m"
ANSI_RESET = "\x1b[0m"


@dataclass(frozen=True)
class Snippet:
    text: str
    line_number: int
    offset: int
    highlights: Tuple[Tuple[int, int], ...]


def _merge_spans(spans: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    if not spans:
        return []
    spans = sorted(spans)
    merged = [spans[0]]
    for s, e in spans[1:]:
        ps, pe = merged[-1]
        if s <= pe:
            merged[-1] = (ps, max(pe, e))
        else:
            merged.append((s, e))
    return merged


def _is_word_char(c: str) -> bool:
    return c.isalnum() or c == "_"


def first_occurrence(content: Optional[str], term: str) -> Optional[Tuple[int, int]]:
    """(char offset, 1-based line number) of the first case-insensitive
    occurrence of ``term`` — the same hit scan (SnippetGenerator.java:76-92)
    and line-number math (:159-166) :func:`generate` applies to its
    highlight anchors, exposed for the oracle-checked ``snippet_lines``
    entry. None when the term does not occur."""
    if not content or not term:
        return None
    j = content.lower().find(term.lower())
    if j < 0:
        return None
    return j, 1 + content.count("\n", 0, j)


def generate(
    content: Optional[str],
    query_terms: Iterable[str],
    context_chars: int = SNIPPET_CONTEXT_CHARS,
    max_snippets: int = MAX_SNIPPETS,
) -> List[Snippet]:
    if not content:
        return []
    context_chars = max(0, context_chars)
    max_snippets = max(1, max_snippets)

    lower = content.lower()
    terms = {t.lower() for t in query_terms if t and t.strip()}
    hits: List[Tuple[int, int]] = []
    for term in terms:
        i = 0
        n = len(lower)
        while i < n:
            j = lower.find(term, i)
            if j < 0:
                break
            hits.append((j, j + len(term)))
            i = j + len(term)
    hits = _merge_spans(hits)
    if not hits:
        return []

    windows: List[Tuple[int, int, int]] = []
    for s, e in hits:
        ws = max(0, s - context_chars)
        we = min(len(content), e + context_chars)
        while ws > 0 and _is_word_char(content[ws - 1]):
            ws -= 1
        while we < len(content) and _is_word_char(content[we]):
            we += 1
        windows.append((ws, we, 1))
    windows.sort(key=lambda w: w[0])
    merged: List[Tuple[int, int, int]] = []
    for ws, we, hc in windows:
        if merged and ws <= merged[-1][1]:
            ps, pe, pc = merged[-1]
            merged[-1] = (ps, max(pe, we), pc + 1)
        else:
            merged.append((ws, we, hc))
    merged.sort(key=lambda w: (-w[2], w[0]))

    out: List[Snippet] = []
    for ws, we, _hc in merged[:max_snippets]:
        rel = _merge_spans(
            [
                (max(s, ws) - ws, min(e, we) - ws)
                for s, e in hits
                if not (e <= ws or s >= we)
            ]
        )
        text = content[ws:we]
        pieces: List[str] = []
        cursor = 0
        for s, e in rel:
            if s > cursor:
                pieces.append(text[cursor:s])
            pieces.append(ANSI_HIGHLIGHT + text[s:e] + ANSI_RESET)
            cursor = e
        pieces.append(text[cursor:])
        anchor = ws + rel[0][0] if rel else ws
        line_no = 1 + content.count("\n", 0, anchor)
        out.append(Snippet("".join(pieces), line_no, ws, tuple(rel)))
    return out
