"""Pure-pandas reference-replica query engine (the parity oracle).

Transcribes the evaluation semantics of query/QueryEngine.java:159-463 over an
in-memory corpus, with one logical "segment" covering the whole corpus (so the
reference's per-segment merge + global-df recomputation collapse into
identities). Used by tests to assert the Spark engine's top-k (doc_id, score)
lists are rank-identical and score-equal.

Semantics replicated exactly:
* Term   — BM25(tf, global df, docLength, N, avgdl); unknown term → ∅
           (QueryEngine.java:211-242)
* Prefix — every dictionary term in [prefix, prefix+∞) evaluated as Term and
           score-summed per doc (QueryEngine.java:244-259)
* Phrase — candidates from first term's postings; all terms present AND
           adjacent (pos_{i+1} = pos_i + 1, iterated expected-set
           intersection); score = Σ member-term BM25
           (QueryEngine.java:261-341)
* AND    — intersection, score sum; OR — union, score sum
           (QueryEngine.java:194-207)
* NOT    — complement vs the live-doc universe, score 0.0
           (QueryEngine.java:181-190)
* Field  — path prefix / ext(lang) equality / filename / type; matches score
           1.0; invalid type value → ∅ (QueryEngine.java:343-368)
* Range  — size (int parse) / mtime (ISO-8601 parse); parse failure → ∅;
           closed interval; matches score 1.0 (QueryEngine.java:370-395)
* final order — score desc; tie-break doc_id asc (the reference's tie order
  is nondeterministic, see SURVEY.md §2.5; we pin the tie-break in both
  engines); sort:mtime / sort:size directives sort that field desc
  (QueryEngine.java:133-157)
"""

from __future__ import annotations

import bisect
from datetime import datetime, timezone
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from . import bm25, querydsl
from .constants import LANG_TO_DOCTYPE, DEFAULT_DOCTYPE
from .querydsl import Bool, Field, Node, Not, Phrase, Prefix, Range, Term
from .tokenizer import terms_only


def _parse_instant(s: str) -> datetime:
    """Java Instant.parse — ISO-8601 with Z."""
    return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(timezone.utc)


class OracleIndex:
    def __init__(
        self,
        docs: pd.DataFrame,
        content_col: str = "content",
        enable_stopwords: bool = True,
    ):
        self.docs = docs.reset_index(drop=True)
        self.meta: Dict[int, dict] = {}
        postings: Dict[str, Dict[int, int]] = {}
        positions: Dict[str, Dict[int, List[int]]] = {}
        token_count: Dict[int, int] = {}
        for row in self.docs.itertuples(index=False):
            d = row._asdict()
            doc_id = int(d["doc_id"])
            terms = terms_only(d.get(content_col) or "", enable_stopwords)
            token_count[doc_id] = len(terms)
            self.meta[doc_id] = d
            for pos, term in enumerate(terms):
                postings.setdefault(term, {})[doc_id] = (
                    postings.get(term, {}).get(doc_id, 0) + 1
                )
                positions.setdefault(term, {}).setdefault(doc_id, []).append(pos)
        self.token_count = token_count
        self.postings = {
            t: dict(sorted(m.items())) for t, m in postings.items()
        }
        self.positions = positions
        self.dictionary = sorted(self.postings.keys())
        self.n_docs = len(self.meta)
        self.avgdl = (
            float(np.mean(list(token_count.values()))) if token_count else 0.0
        )
        self.all_doc_ids = sorted(self.meta.keys())

    # ------------------------------------------------------------- stats
    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    # -------------------------------------------------------------- eval
    def _score_term(self, term: str, N: int, avgdl: float) -> Dict[int, float]:
        t = (term or "").lower()
        if not t.strip():
            return {}
        plist = self.postings.get(t)
        if not plist:
            return {}
        dfv = len(plist)
        if dfv <= 0:
            return {}
        return {
            doc: bm25.score(tf, dfv, self.token_count[doc], N, avgdl)
            for doc, tf in plist.items()
        }

    def _score_prefix(self, prefix: str, N: int, avgdl: float) -> Dict[int, float]:
        p = (prefix or "").lower()
        if not p.strip():
            return {}
        lo = bisect.bisect_left(self.dictionary, p)
        out: Dict[int, float] = {}
        for i in range(lo, len(self.dictionary)):
            term = self.dictionary[i]
            if not term.startswith(p):
                break
            for doc, s in self._score_term(term, N, avgdl).items():
                out[doc] = out.get(doc, 0.0) + s
        return out

    def _score_phrase(self, terms, N: int, avgdl: float) -> Dict[int, float]:
        if not terms:
            return {}
        cache: Dict[str, Dict[int, float]] = {}
        first: Optional[Dict[int, float]] = None
        for term in terms:
            t = (term or "").lower()
            if not t.strip():
                continue
            scores = self._score_term(t, N, avgdl)
            cache[t] = scores
            if first is None:
                first = scores
        if not first:
            return {}
        out: Dict[int, float] = {}
        for doc in first:
            if self._phrase_in_doc(terms, doc):
                s = 0.0
                for term in terms:
                    t = (term or "").lower()
                    if not t.strip():
                        continue
                    s += cache.get(t, {}).get(doc, 0.0)
                out[doc] = s
        return out

    def _phrase_in_doc(self, terms, doc_id: int) -> bool:
        pos_lists = []
        for term in terms:
            t = (term or "").lower()
            if not t.strip():
                return False
            plist = self.positions.get(t, {}).get(doc_id)
            if not plist:
                return False
            pos_lists.append(plist)
        expected = {p + 1 for p in pos_lists[0]}
        for plist in pos_lists[1:]:
            cur = {p + 1 for p in plist if p in expected}
            if not cur:
                return False
            expected = cur
        return True

    def _eval_field(self, node: Field) -> Dict[int, float]:
        f, v = node.field, node.value
        if f == "path":
            norm = v.replace("\\", "/")
            ids = [
                d for d, m in self.meta.items()
                if str(m.get("path", "")).startswith(norm)
            ]
        elif f in ("ext", "lang"):
            ids = [
                d for d, m in self.meta.items()
                if str(m.get("lang", "")).lower() == v.lower()
            ]
        elif f == "repo":
            ids = [d for d, m in self.meta.items() if str(m.get("repo", "")) == v]
        elif f in ("filename", "name"):
            nv = v.lower()
            ids = [
                d for d, m in self.meta.items()
                if str(m.get("path", "")).lower() == nv
                or str(m.get("path", "")).lower().endswith("/" + nv)
            ]
        elif f == "type":
            tv = v.upper()
            if tv not in {"CODE", "NOTE", "DOC", "DATA", "CONFIG", "OTHER"}:
                return {}
            ids = [d for d, m in self.meta.items() if self._doc_type(m) == tv]
        else:
            return {}
        return {d: 1.0 for d in ids}

    @staticmethod
    def _doc_type(m: dict) -> str:
        if m.get("doc_type"):
            return str(m["doc_type"])
        return LANG_TO_DOCTYPE.get(str(m.get("lang", "")).lower(), DEFAULT_DOCTYPE)

    def _eval_range(self, node: Range) -> Dict[int, float]:
        try:
            if node.field == "size":
                lo, hi = int(node.lo), int(node.hi)
                ids = [
                    d for d, m in self.meta.items()
                    if lo <= int(m.get("size_bytes", len(str(m.get("content", ""))))) <= hi
                ]
            elif node.field == "mtime":
                lo_t, hi_t = _parse_instant(node.lo), _parse_instant(node.hi)
                ids = []
                for d, m in self.meta.items():
                    mt = m.get("mtime")
                    if mt is None:
                        continue
                    if isinstance(mt, str):
                        mt = _parse_instant(mt)
                    if isinstance(mt, pd.Timestamp):
                        mt = mt.to_pydatetime()
                    if mt.tzinfo is None:
                        mt = mt.replace(tzinfo=timezone.utc)
                    if lo_t <= mt <= hi_t:
                        ids.append(d)
            else:
                return {}
        except (ValueError, TypeError):
            return {}
        return {d: 1.0 for d in ids}

    def evaluate(self, node: Node, N: int, avgdl: float) -> Dict[int, float]:
        if isinstance(node, Term):
            return self._score_term(node.term, N, avgdl)
        if isinstance(node, Prefix):
            return self._score_prefix(node.prefix, N, avgdl)
        if isinstance(node, Phrase):
            return self._score_phrase(list(node.terms), N, avgdl)
        if isinstance(node, Field):
            return self._eval_field(node)
        if isinstance(node, Range):
            return self._eval_range(node)
        if isinstance(node, Not):
            child = self.evaluate(node.child, N, avgdl)
            return {d: 0.0 for d in self.all_doc_ids if d not in child}
        if isinstance(node, Bool):
            left = self.evaluate(node.left, N, avgdl)
            right = self.evaluate(node.right, N, avgdl)
            if node.op == "AND":
                return {
                    d: s + right[d] for d, s in left.items() if d in right
                }
            out = dict(left)
            for d, s in right.items():
                out[d] = out.get(d, 0.0) + s
            return out
        return {}

    # ------------------------------------------------------------ search
    def search(self, query: str, limit: int = 10) -> Tuple[List[Tuple[int, float]], int]:
        """Returns (top-k [(doc_id, score)], total_matches)."""
        result = querydsl.parse(query)
        N = max(self.n_docs, 1)
        avgdl = max(self.avgdl, 1.0)
        scores = self.evaluate(result.ast, N, avgdl)
        total = len(scores)
        if result.sort is not None and result.sort.field in ("mtime", "size"):
            field = result.sort.field
            if field == "size":
                key = lambda d: (
                    -int(self.meta[d].get("size_bytes", 0)),
                    d,
                )
            else:
                def key(d):
                    mt = self.meta[d].get("mtime")
                    if isinstance(mt, str):
                        mt = _parse_instant(mt)
                    ts = mt.timestamp() if mt is not None else 0.0
                    return (-ts, d)
            ordered = sorted(scores.keys(), key=key)
            hits = [(d, scores[d]) for d in ordered[: max(limit, 0)]]
        else:
            ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
            hits = ordered[: max(limit, 0)]
        return hits, total
