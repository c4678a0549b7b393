"""Low-latency local query executor.

The reference serves queries from one process: dictionary lookup → posting
decode → numpy-style scoring over int arrays (query/QueryEngine.java:211-242)
with metadata lookups in SQLite. This module is that serving tier on top of
the Spark-built index: ONE term-pruned parquet scan fetches the query terms'
posting shards (Catalyst pushes ``term IN (…)`` / ``startswith`` down to the
term-sorted files), everything after that is vectorized numpy on the driver.

Scope guard: this tier is for the latency path (small top-k over a handful of
terms). The distributed DataFrame/WAND paths in lse.engine remain the route
for huge results, huge metadata (N beyond ``meta_limit``), or cluster-side
fan-out — SearchEngine picks automatically.

Semantics are identical to the oracle/reference (same AST evaluation rules,
same BM25, same (score desc, doc_id asc) tie-break).
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from datetime import datetime, timezone
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from . import querydsl
from .bm25 import idf as idf_fn
from .codec import decode_postings, raw_bm25_component
from .constants import MAX_SEARCH_LIMIT
from .ids import member_mask
from .querydsl import Bool, Field, Node, Not, Phrase, Prefix, Range, Term

log = logging.getLogger("lse.local_exec")


class _ByteLRU:
    """Byte-budgeted LRU over decoded numpy payloads (postings / positions).

    The driver may hold MANY terms' decoded arrays across a query session;
    an unbounded dict would grow with the query mix until the driver OOMs.
    Whole-entry eviction in least-recently-used order, budgeted by the
    entries' actual array bytes."""

    def __init__(self, byte_budget: int, max_entries: int = 262_144):
        import threading

        self.byte_budget = int(byte_budget)
        # entry-count cap: negative-cache entries (empty arrays) have zero
        # payload bytes, so a stream of unknown terms would otherwise grow
        # the dict unboundedly — ~100 B/key keeps the cap at ~tens of MB
        self.max_entries = int(max_entries)
        self._d: "OrderedDict[str, tuple]" = OrderedDict()
        self._sizes: Dict[str, int] = {}
        self.bytes = 0
        # serving may be multi-threaded; get/put each span several dict +
        # counter operations that must not interleave (entries themselves
        # are immutable decode results, so readers holding a value are safe)
        self._lock = threading.Lock()

    @staticmethod
    def _nbytes(value) -> int:
        n = 0
        for v in value:
            if isinstance(v, np.ndarray):
                n += v.nbytes
            elif isinstance(v, tuple):
                n += _ByteLRU._nbytes(v)
        return n

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def get(self, key: str, default=None):
        with self._lock:
            v = self._d.get(key)
            if v is None:
                return default
            self._d.move_to_end(key)
            return v

    def __getitem__(self, key: str):
        v = self.get(key)
        if v is None and key not in self._d:
            raise KeyError(key)
        return v

    def put(self, key: str, value: tuple) -> None:
        size = self._nbytes(value)
        with self._lock:
            self._put_locked(key, value, size)

    def _put_locked(self, key: str, value: tuple, size: int) -> None:
        if key in self._d:
            self.bytes -= self._sizes.pop(key)
            del self._d[key]
        self._d[key] = value
        self._sizes[key] = size
        self.bytes += size
        while (
            self.bytes > self.byte_budget or len(self._d) > self.max_entries
        ) and len(self._d) > 1:
            old_k, _old_v = self._d.popitem(last=False)
            self.bytes -= self._sizes.pop(old_k)

    def setdefault(self, key: str, value: tuple):
        # one critical section — a check-then-act across two lock
        # acquisitions would reintroduce the race the lock exists to fix
        size = self._nbytes(value)  # sizing outside the lock (read-only)
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                self._d.move_to_end(key)
                return v
            self._put_locked(key, value, size)
            return value

    def __setitem__(self, key: str, value: tuple) -> None:
        self.put(key, value)

    def __iter__(self):
        return iter(list(self._d))

    def __len__(self) -> int:
        return len(self._d)


def _topk_order(ids: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, id asc) — a value partition
    narrows to the score-threshold candidate set first, so selecting 10 of
    1M costs O(n) + a tiny sort instead of a full O(n log n) lexsort.

    The threshold partition runs on the int64 BIT VIEW of the scores:
    IEEE-754 bit patterns of non-negative doubles order exactly like the
    doubles (BM25 scores are never negative; ``+ 0.0`` normalizes -0.0),
    and integer introselect is ~2-3x faster than the old
    ``argpartition(-scores)`` — which also paid a full negated copy and
    degraded badly on heavily tied score arrays."""
    n = ids.size
    if k >= n or n <= 4096:
        return np.lexsort((ids, -scores))[:k]
    if scores.dtype == np.float64:
        v = (scores + 0.0).view(np.int64)
    elif np.issubdtype(scores.dtype, np.integer):
        v = scores  # integer order needs no bit trick
    else:
        return np.lexsort((ids, -scores))[:k]
    thresh = np.partition(v, n - k)[n - k]
    cand = np.flatnonzero(v >= thresh)
    if cand.size == n:  # fully tied — the partition narrowed nothing
        return np.lexsort((ids, -scores))[:k]
    order = np.lexsort((ids[cand], -scores[cand]))[:k]
    return cand[order]


class _ScoreSet:
    """A matched-doc set with scores: parallel sorted-unique numpy arrays."""

    __slots__ = ("ids", "scores")

    def __init__(self, ids: np.ndarray, scores: np.ndarray):
        self.ids = ids
        self.scores = scores

    @staticmethod
    def empty() -> "_ScoreSet":
        return _ScoreSet(np.empty(0, dtype=np.int64), np.empty(0))

    @staticmethod
    def from_unsorted(ids: np.ndarray, scores: np.ndarray) -> "_ScoreSet":
        uniq, inverse = np.unique(ids, return_inverse=True)
        summed = np.zeros(len(uniq))
        np.add.at(summed, inverse, scores)
        return _ScoreSet(uniq, summed)

    def union_sum(self, other: "_ScoreSet") -> "_ScoreSet":
        return _ScoreSet.from_unsorted(
            np.concatenate([self.ids, other.ids]),
            np.concatenate([self.scores, other.scores]),
        )

    def intersect_sum(self, other: "_ScoreSet") -> "_ScoreSet":
        # both id arrays are sorted-unique: binary-search the smaller into
        # the larger (O(n log m)) instead of intersect1d's concat-and-sort
        a, b = (self, other) if self.ids.size <= other.ids.size else (other, self)
        if a.ids.size == 0 or b.ids.size == 0:
            return _ScoreSet.empty()
        idx = np.searchsorted(b.ids, a.ids)
        np.minimum(idx, b.ids.size - 1, out=idx)
        m = b.ids[idx] == a.ids
        return _ScoreSet(a.ids[m], a.scores[m] + b.scores[idx[m]])


class LocalExecutor:
    def __init__(
        self,
        engine,
        meta_limit: int = 2_000_000,
        postings_byte_budget: int = 256 << 20,
        positions_byte_budget: int = 256 << 20,
        dict_row_limit: int = 2_000_000,
        dict_byte_budget: int = 256 << 20,
        cache_byte_budget: int = 4 << 30,
    ):
        self.engine = engine
        self.meta_limit = meta_limit
        # budgets bound what one query may COLLECT to the driver: postings
        # payloads for its terms/prefix expansions, position blobs for its
        # phrase terms. Queries over budget are served by the distributed
        # tiers instead — a hot term (df→N) must never OOM the driver.
        # Defaults assume a serving driver with ≳16 GB of headroom (the
        # reference holds its ENTIRE index in-process, DictionaryReader's
        # TreeMap + posting files mmap'd; our bound is explicit instead) —
        # shrink via the constructor on small drivers. Routing stays a
        # PURE function of query + dictionary — the budgets only scale the
        # admission threshold.
        self.postings_byte_budget = postings_byte_budget
        self.positions_byte_budget = positions_byte_budget
        self.dict_row_limit = dict_row_limit
        self.dict_byte_budget = dict_byte_budget
        # decoded-array LRUs: repeat queries at multi-million-doc scale
        # serve from these without re-collecting/decoding, while the byte
        # budget keeps a long diverse query mix from growing the driver
        import threading

        self._tls = threading.local()  # per-query working state (see below)
        self._fetch_pool_lock = threading.Lock()
        self._fetch_pool_ = None
        self._postings_cache = _ByteLRU(cache_byte_budget)
        self._prefix_cache: Dict[str, List[str]] = {}
        self._positions_cache = _ByteLRU(cache_byte_budget // 2)
        # raw phrase-match doc sets, keyed to the position-decode
        # identities (phrase serving's warm path)
        self._phrase_cache = _ByteLRU(cache_byte_budget // 8)
        # per-TERM rank-key arrays ((doc_rank << 32) + position over the
        # live universe, phrase.rank_keys): built once per term, shared by
        # every phrase using the term — the first-touch phrase kernel then
        # reduces to scalar-offset sorted intersections
        self._pkey_cache = _ByteLRU(cache_byte_budget // 4)
        # per-term idf·raw score arrays (N/avgdl are fixed per engine, so
        # these never go stale) — repeat term queries skip BM25 entirely
        self._scores_cache = _ByteLRU(cache_byte_budget // 2)
        # per-term rank arrays into the sorted doc-id universe — the
        # accumulator OR path (multi-term unions without a 4M-element sort)
        self._ranks_cache = _ByteLRU(cache_byte_budget // 4)
        self._meta: Optional[pd.DataFrame] = None
        # (field/range node → sorted matching doc-id array). Exactly as
        # consistent as self._meta itself: both live for this executor's
        # lifetime and an index change builds a new engine+executor.
        self._filter_ids_cache: dict = {}
        self._all_ids: Optional[np.ndarray] = None
        self._tc: Optional[pd.Series] = None
        # in-memory dictionary: sorted term array + (payload bytes, df) —
        # the routing oracle (the reference keeps its whole dictionary in a
        # TreeMap, DictionaryReader.java:27-87; we keep only 3 columns)
        self._dict_terms: Optional[np.ndarray] = None
        self._dict_bytes: Optional[np.ndarray] = None
        self._dict_df: Optional[np.ndarray] = None
        # per-term block-bound shape: max and mean of the per-128-doc-block
        # raw-BM25 maxima — the one-pass stat strategy='auto' consults to
        # decide whether block-max WAND will actually prune (high variance:
        # few spike blocks dominate) or degenerate to a full walk (uniform
        # scores: every block's bound ≈ the global bound)
        self._dict_bmax_max: Optional[np.ndarray] = None
        self._dict_bmax_avg: Optional[np.ndarray] = None
        self._dict_bmax_n: Optional[np.ndarray] = None
        self._dict_unavailable = False
        self._pos_terms: Optional[np.ndarray] = None
        self._pos_bytes: Optional[np.ndarray] = None
        self._pos_unavailable = False

    # ----------------------------------------------------- routing dictionary
    def _load_dictionary(self) -> bool:
        """Load (term, bytes, df) once. False if the vocabulary exceeds
        dict_row_limit — then the driver must not route by dictionary and
        big queries go distributed."""
        if self._dict_terms is not None:
            return True
        if self._dict_unavailable:
            return False
        # cheap pre-check: the manifest records posting ROWS per file, and
        # rows ≈ vocab × buckets — if the vocabulary clearly exceeds the
        # dictionary limit, skip the (full-shuffle) groupBy entirely
        import os as _os

        n_buckets = max(int(self.engine.stats.get("n_buckets", 1)), 1)
        try:
            man = self.engine.spark.read.parquet(
                _os.path.join(self.engine.index_dir, "manifest")
            )
            total_rows = man.agg(F.sum("rows")).first()[0] or 0
            if total_rows / n_buckets > self.dict_row_limit * 2:
                self._dict_unavailable = True
                return False
        except Exception:
            pass  # no manifest (partial build) — fall through to the agg
        agg = (
            self.engine.postings.groupBy("term")
            .agg(
                F.sum(F.octet_length("payload")).alias("bytes"),
                F.sum("df_shard").alias("df"),
                F.max(F.array_max("block_max_raw")).alias("bmax_max"),
                F.sum(
                    F.aggregate("block_max_raw", F.lit(0.0), lambda s, x: s + x)
                ).alias("bmax_sum"),
                F.sum(F.size("block_max_raw")).alias("bmax_n"),
            )
            .limit(self.dict_row_limit + 1)
        )
        pdf = agg.toPandas()
        if len(pdf) > self.dict_row_limit:
            log.warning(
                "routing dictionary unavailable: vocabulary exceeds "
                "dict_row_limit=%d — local-tier admission degrades to the "
                "small-corpus gate for this session", self.dict_row_limit,
            )
            self._dict_unavailable = True
            return False
        # byte cap (not just the row cliff): the dictionary lives on the
        # driver for the whole session — degrade EXPLICITLY when a huge
        # vocabulary would pin too much memory, with a log line saying so
        approx_bytes = int(
            pdf["term"].str.len().sum() * 4 + len(pdf) * 8 * 5
        )
        if approx_bytes > self.dict_byte_budget:
            log.warning(
                "routing dictionary unavailable: ~%d bytes exceeds "
                "dict_byte_budget=%d — local-tier admission degrades to the "
                "small-corpus gate", approx_bytes, self.dict_byte_budget,
            )
            self._dict_unavailable = True
            return False
        pdf = pdf.sort_values("term").reset_index(drop=True)
        self._dict_terms = pdf["term"].to_numpy()
        self._dict_bytes = pdf["bytes"].to_numpy(dtype=np.int64)
        self._dict_df = pdf["df"].to_numpy(dtype=np.int64)
        self._dict_bmax_max = pdf["bmax_max"].to_numpy(dtype=np.float64)
        self._dict_bmax_n = np.maximum(pdf["bmax_n"].to_numpy(dtype=np.int64), 1)
        self._dict_bmax_avg = (
            pdf["bmax_sum"].to_numpy(dtype=np.float64) / self._dict_bmax_n
        )
        return True

    def _load_pos_dictionary(self) -> bool:
        if self._pos_terms is not None:
            return True
        if self._pos_unavailable or self.engine.positions is None:
            return False
        agg = (
            self.engine.positions.groupBy("term")
            .agg(F.sum(F.octet_length("payload")).alias("bytes"))
            .limit(self.dict_row_limit + 1)
        )
        pdf = agg.toPandas()
        if len(pdf) > self.dict_row_limit:
            self._pos_unavailable = True
            return False
        pdf = pdf.sort_values("term").reset_index(drop=True)
        self._pos_terms = pdf["term"].to_numpy()
        self._pos_bytes = pdf["bytes"].to_numpy(dtype=np.int64)
        return True

    @staticmethod
    def _range_bytes(terms_arr, bytes_arr, lo: str, hi: str) -> int:
        a = int(np.searchsorted(terms_arr, lo, side="left"))
        b = int(np.searchsorted(terms_arr, hi, side="left"))
        return int(bytes_arr[a:b].sum())

    def _term_bytes(self, terms_arr, bytes_arr, term: str) -> int:
        i = int(np.searchsorted(terms_arr, term, side="left"))
        if i < len(terms_arr) and terms_arr[i] == term:
            return int(bytes_arr[i])
        return 0

    # ----------------------------------------------------------- data access
    def _needs_meta(self, node: Node) -> bool:
        if isinstance(node, (Field, Range, Not)):
            return True
        if isinstance(node, Bool):
            return self._needs_meta(node.left) or self._needs_meta(node.right)
        if isinstance(node, Not):
            return True
        return False

    def meta(self) -> pd.DataFrame:
        if self._meta is None:
            cols = ["doc_id", "repo", "path", "lang", "doc_type", "size_bytes", "mtime"]
            have = [c for c in cols if c in self.engine.doc_stats.columns]
            pdf = (
                self.engine.doc_stats.select(*have).toPandas().set_index("doc_id", drop=False)
            )
            # equality-filtered low-cardinality columns as categoricals:
            # `col == value` then compares small category codes instead of
            # N python strings per query (~3 ms/query at 50k docs)
            for c in ("repo", "lang", "doc_type"):
                if c in pdf.columns:
                    pdf[c] = pdf[c].astype("category")
            self._meta = pdf
        return self._meta

    def all_doc_ids(self) -> np.ndarray:
        if self._all_ids is None:
            self._all_ids = np.sort(self.meta()["doc_id"].to_numpy(dtype=np.int64))
        return self._all_ids

    def _sort_key_arrays(self, field: str):
        """(sorted doc-id universe, aligned int64 sort-key values) for a
        ``sort:size`` / ``sort:mtime`` directive — built once per field,
        then every sorted query is a searchsorted instead of a pandas
        hash reindex. Exactly as consistent as self._meta (same
        lifetime)."""
        key = ("sortkeys", field)
        hit = self._filter_ids_cache.get(key)
        if hit is not None:
            return hit
        m = self.meta()
        ids = m["doc_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        if field == "size":
            vals = m["size_bytes"].to_numpy()[order]
        else:
            vals = (
                pd.to_datetime(m["mtime"], utc=True).astype("int64").to_numpy()[order]
            )
        pair = (ids[order], vals)
        self._filter_ids_cache[key] = pair
        return pair

    def fetch_terms(self, terms: List[str], prefixes: List[str]) -> None:
        """One term-pruned scan for all postings the query needs.

        Fills the PER-QUERY working set (``_query_postings``) — the LRU is
        only a read-through accelerator. Evaluation must never depend on an
        entry surviving in the LRU (a tiny budget may evict a term between
        fetch and eval; that must cost a re-decode next query, never a
        wrong result)."""
        if self._query_postings is None:
            self._query_postings = {}
        if self._prefix_terms is None:
            self._prefix_terms = {}
        missing = []
        for t in terms:
            hit = self._postings_cache.get(t)
            if hit is not None:
                self._query_postings[t] = hit
            else:
                missing.append(t)
        new_prefixes = [p for p in prefixes if p not in self._prefix_cache]
        for p in prefixes:
            if p in self._prefix_cache:
                exp = self._prefix_cache[p]
                self._prefix_terms[p] = exp
                # expansion terms must be materialized for this query too
                for t in exp:
                    if t not in self._query_postings:
                        hit = self._postings_cache.get(t)
                        if hit is not None:
                            self._query_postings[t] = hit
                        else:
                            missing.append(t)
        missing = sorted(set(missing))
        # dictionary-resolved absences never touch Spark: a term with zero
        # payload bytes is not in the vocabulary — negative-cache it in the
        # LRU too, so REPEATS of unknown-term queries cost no job either
        if missing and self._load_dictionary():
            neg = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                   np.empty(0, dtype=np.int64), 0)
            still = []
            for t in missing:
                if self._term_bytes(self._dict_terms, self._dict_bytes, t) == 0:
                    self._query_postings[t] = neg
                    self._postings_cache.put(t, neg)
                else:
                    still.append(t)
            missing = still
        conds = []
        if missing:
            conds.append(F.col("term").isin(missing))
        for p in new_prefixes:
            conds.append(F.col("term").startswith(p))
        if not conds:
            return
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        rows = (
            self.engine.postings.filter(cond)
            .select("term", "bucket", "df_shard", "df", "payload")
            .collect()
        )
        by_term: Dict[str, list] = {}
        for r in rows:
            by_term.setdefault(r["term"], []).append(r)
        tomb = self.engine.tomb_ids
        for term, shard_rows in by_term.items():
            shard_rows.sort(key=lambda r: r["bucket"])  # bucket order == doc order
            ids_l, tf_l, dl_l = [], [], []
            for r in shard_rows:
                i, t, d = decode_postings(bytes(r["payload"]), int(r["df_shard"]))
                ids_l.append(i)
                tf_l.append(t)
                dl_l.append(d)
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tf_l)
            dls = np.concatenate(dl_l)
            if self.engine.multi_segment:
                # segments interleave in doc-id space; restore sorted order
                order = np.argsort(ids, kind="stable")
                ids, tfs, dls = ids[order], tfs[order], dls[order]
            if tomb.size:
                live = ~member_mask(ids, tomb)
                ids, tfs, dls = ids[live], tfs[live], dls[live]
            # live GLOBAL df across segments (QueryEngine.java:445-463)
            entry = (ids, tfs, dls, int(ids.size))
            self._query_postings[term] = entry
            self._postings_cache.put(term, entry)
        # negative-cache plain terms that do not exist in the dictionary
        neg = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
               np.empty(0, dtype=np.int64), 0)
        for t in missing:
            if t not in self._query_postings:
                self._query_postings[t] = neg
                self._postings_cache.put(t, neg)
        # prefixes: remember the expansion term lists (per query and cached)
        for p in new_prefixes:
            expansion = sorted(t for t in by_term if t.startswith(p))
            self._prefix_terms[p] = expansion
            self._prefix_cache[p] = expansion

    # Per-QUERY working state lives in thread-local storage: a SearchEngine
    # (and its LocalExecutor) may serve queries from multiple threads, and
    # instance attributes would let one thread's execute() reset reclaim
    # another thread's fetched postings mid-evaluation (the concurrency
    # test reproduces exactly that clobber). The LRUs stay shared (their
    # entries are immutable decode results); only the query-scoped dicts
    # are thread-local.
    @property
    def _query_postings(self):
        return getattr(self._tls, "query_postings", None)

    @_query_postings.setter
    def _query_postings(self, value):
        self._tls.query_postings = value

    @property
    def _prefix_terms(self):
        return getattr(self._tls, "prefix_terms", None)

    @_prefix_terms.setter
    def _prefix_terms(self, value):
        self._tls.prefix_terms = value

    def _fetch_pool(self):
        """Single-thread pool for overlapping independent driver collects
        within one query (postings ∥ positions). Created lazily under its
        own lock so concurrent serving threads share one pool (the worker
        thread is only spawned on first use)."""
        with self._fetch_pool_lock:
            if self._fetch_pool_ is None:
                from concurrent.futures import ThreadPoolExecutor

                self._fetch_pool_ = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="lse-fetch"
                )
            return self._fetch_pool_

    def _positions_for(self, terms: List[str]):
        """term → flat TermPositions (doc_ids, counts, flat positions),
        merged across segment shards. Returns a QUERY-LOCAL dict (the LRU
        only accelerates — an eviction can never blank a phrase term
        mid-query)."""
        if self.engine.positions is None:
            return {}
        from .phrase import empty_positions, merge_shards

        want = set(terms)
        out: Dict[str, tuple] = {}
        missing = []
        for t in want:
            hit = self._positions_cache.get(t)
            if hit is not None:
                out[t] = hit
            else:
                missing.append(t)
        missing = sorted(missing)
        if missing:
            from .codec import decode_positions_flat

            rows = (
                self.engine.positions.filter(F.col("term").isin(missing))
                .select("term", "n_docs", "payload")
                .collect()
            )
            shards: Dict[str, list] = {t: [] for t in missing}
            for r in rows:
                shards[r["term"]].append(
                    decode_positions_flat(bytes(r["payload"]), int(r["n_docs"]))
                )
            for t in missing:
                merged = merge_shards(shards[t])
                out[t] = merged
                self._positions_cache.put(t, merged)
        for t in want:
            out.setdefault(t, empty_positions())
        return out

    # ------------------------------------------------------------ evaluation
    def _score_term(self, term: str) -> _ScoreSet:
        t = (term or "").lower()
        if not t.strip():
            return _ScoreSet.empty()
        ids, tfs, dls, df = self._query_postings.get(
            t, (np.empty(0, dtype=np.int64), None, None, 0)
        )
        if df <= 0 or ids.size == 0:
            return _ScoreSet.empty()
        cached = self._scores_cache.get(t)
        if cached is not None and cached[0] is tfs:
            return _ScoreSet(ids, cached[1])
        idf_v = idf_fn(df, self.engine.N)
        scores = idf_v * raw_bm25_component(tfs, dls, self.engine.avgdl)
        # key the cache entry to THIS decode (identity of tfs): a term
        # re-fetched after LRU eviction gets fresh scores, never stale ones
        self._scores_cache.put(t, (tfs, scores))
        return _ScoreSet(ids, scores)

    def _flat_or_terms(self, node: Node) -> Optional[List[str]]:
        """Term list (with multiplicity) if node is a pure OR tree of Terms."""
        if isinstance(node, Term):
            return [node.term.lower()]
        if isinstance(node, Bool) and node.op == "OR":
            l = self._flat_or_terms(node.left)
            r = self._flat_or_terms(node.right)
            if l is not None and r is not None:
                return l + r
        return None

    def _term_ranks(self, term: str, ids: np.ndarray) -> Optional[np.ndarray]:
        """Positions of a term's doc ids in the sorted universe, LRU-cached
        keyed to the decode identity (same invalidation rule as scores).
        Verified once per decode: returns None if any id is not in the
        universe (callers then fall back to the sort-based union)."""
        cached = self._ranks_cache.get(term)
        if cached is not None and cached[0] is ids:
            return cached[1]
        universe = self._all_ids
        ranks = np.searchsorted(universe, ids)
        if ranks.size and (
            int(ranks[-1]) >= universe.size
            or not np.array_equal(universe[ranks], ids)
        ):
            return None  # pragma: no cover — live postings ⊆ live universe
        self._ranks_cache.put(term, (ids, ranks))
        return ranks

    def _eval_or_accumulator(self, terms: List[str]) -> Optional[_ScoreSet]:
        """Multi-term OR as ONE dense score-accumulator pass over the doc
        universe — O(Σ df) adds instead of sorting the Σ df concatenation
        (np.unique), the classic accumulator design. Only when the sorted
        universe array is already materialized (warm() pre-pays it) —
        never triggers a metadata collect on its own. Summation order per
        doc is left-to-right over the term list, identical to the chained
        union_sum fallback, so scores are bit-identical."""
        if self._all_ids is None or len(terms) < 2:
            return None
        universe = self._all_ids
        acc = np.zeros(universe.size)
        for t in terms:
            ss = self._score_term(t)
            if ss.ids.size == 0:
                continue
            ranks = self._term_ranks(t, ss.ids)
            if ranks is None:
                return None  # fall back to the sort-based union
            acc[ranks] += ss.scores
        nz = np.flatnonzero(acc)  # BM25 scores are strictly positive
        return _ScoreSet(universe[nz], acc[nz])

    def _eval(self, node: Node, positions) -> _ScoreSet:
        if isinstance(node, Term):
            return self._score_term(node.term)
        if isinstance(node, Prefix):
            p = node.prefix.lower()
            terms = self._prefix_terms.get(p, [])
            # expansion union: the dense accumulator is bit-identical to
            # the chained union_sum (see _eval_or_accumulator) and skips
            # its per-step np.unique sort; a 1-term expansion IS that
            # term's score set (union with ∅ re-sorted ~1 M ids for
            # nothing — 30 ms of the warm prefix class at 1.28 M docs)
            if len(terms) >= 2:
                got = self._eval_or_accumulator(terms)
                if got is not None:
                    return got
            out = _ScoreSet.empty()
            for t in terms:
                ss = self._score_term(t)
                out = ss if out.ids.size == 0 else out.union_sum(ss)
            return out
        if isinstance(node, Phrase):
            return self._eval_phrase(list(node.terms), positions)
        if isinstance(node, Field):
            return self._eval_field(node)
        if isinstance(node, Range):
            return self._eval_range(node)
        if isinstance(node, Not):
            child = self._eval(node.child, positions)
            universe = self.all_doc_ids()
            # search the SMALLER side: child id sets are (almost always)
            # subsets of the sorted universe, so locating |child| ids and
            # knocking them out of a ones-mask beats |universe| binary
            # searches into the child set. Validity is checked exactly —
            # any non-member falls back to the general mask. A Term child's
            # universe ranks are already LRU-cached (+validated once per
            # decode) by _term_ranks — reuse them instead of re-running the
            # search + gather-compare per query (~30 ms at 1 M-df terms).
            if 0 < child.ids.size < universe.size:
                pos = None
                if isinstance(node.child, Term):
                    pos = self._term_ranks(node.child.term.lower(), child.ids)
                if pos is None:
                    cand = np.searchsorted(universe, child.ids)
                    np.minimum(cand, universe.size - 1, out=cand)
                    if np.array_equal(universe[cand], child.ids):
                        pos = cand
                if pos is not None:
                    keep = np.ones(universe.size, dtype=bool)
                    keep[pos] = False
                    rest = universe[keep]
                    return _ScoreSet(rest, np.zeros(rest.size))
            rest = universe[~member_mask(universe, child.ids)]
            return _ScoreSet(rest, np.zeros(rest.size))
        if isinstance(node, Bool):
            if node.op == "OR":
                flat = self._flat_or_terms(node)
                if flat is not None:
                    got = self._eval_or_accumulator(flat)
                    if got is not None:
                        return got
            if node.op == "AND":
                # AND-pushdown: when one side is a flat OR of ≥2 terms,
                # never materialize the OR's union (a df→N accumulator at
                # hot-term scale) — score each OR term directly over the
                # other side's id set via binary search. Semantics equal
                # intersect_sum(other, union): ids = other ∩ (∪ terms),
                # score = other + Σ per-occurrence term scores.
                for a_node, b_node in (
                    (node.left, node.right), (node.right, node.left)
                ):
                    terms = self._flat_or_terms(b_node)
                    if terms is not None and len(terms) >= 2:
                        return self._and_or_pushdown(a_node, terms, positions)
            left = self._eval(node.left, positions)
            right = self._eval(node.right, positions)
            if node.op == "AND":
                fast = self._intersect_sum_ranked(node, left, right)
                if fast is not None:
                    return fast
                return left.intersect_sum(right)
            return left.union_sum(right)
        return _ScoreSet.empty()

    def _intersect_sum_ranked(
        self, node: Bool, left: _ScoreSet, right: _ScoreSet
    ) -> Optional[_ScoreSet]:
        """Term AND Term over the cached universe-rank arrays: one boolean
        scatter + gathers instead of intersect_sum's O(n log m) binary
        search (29 ms → ~8 ms at two ~1 M-df terms over a 1.28 M-doc
        universe). Pairings and operand values are identical to
        intersect_sum and float64 addition is commutative, so scores are
        bit-identical; output ids are the same sorted intersection.
        Returns None (→ caller falls back) when either side is not a plain
        Term, ranks are unavailable, or the sets are small enough that the
        binary search wins (same |a|·8 > N threshold as the pushdown)."""
        universe = self._all_ids
        if (
            universe is None
            or not isinstance(node.left, Term)
            or not isinstance(node.right, Term)
        ):
            return None
        (a_set, a_node), (b_set, b_node) = sorted(
            ((left, node.left), (right, node.right)),
            key=lambda p: p[0].ids.size,
        )
        if a_set.ids.size == 0:
            return _ScoreSet.empty()
        if a_set.ids.size * 8 <= universe.size:
            return None  # small side: binary search is cheaper than O(N)
        ra = self._term_ranks(a_node.term.lower(), a_set.ids)
        rb = self._term_ranks(b_node.term.lower(), b_set.ids)
        if ra is None or rb is None:
            return None
        ina = np.zeros(universe.size, dtype=bool)
        ina[ra] = True
        m = ina[rb]
        dense = np.empty(universe.size)
        dense[ra] = a_set.scores
        return _ScoreSet(b_set.ids[m], b_set.scores[m] + dense[rb[m]])

    def _and_or_pushdown(
        self, a_node: Node, terms: List[str], positions
    ) -> _ScoreSet:
        """``a AND (t1 OR t2 OR …)`` without building the OR union: keep the
        ``a`` docs matching ≥1 term, scores summed per OCCURRENCE (duplicate
        terms add twice — union_sum parity; accumulation order t1,t2,… then
        base+Σ matches the oracle's union-then-intersect float order).

        Fast path: rank-space accumulation over the doc universe — every
        per-term step is O(df) fancy indexing against the CACHED rank
        arrays (no per-query binary searches); when ``a`` is itself a Term
        its ranks are cached too. Falls back to binary-search membership
        when the universe/ranks are unavailable."""
        base = self._eval(a_node, positions)
        if base.ids.size == 0:
            return _ScoreSet.empty()
        universe = self._all_ids
        base_ranks = None
        # rank accumulation costs O(N + Σ df); for a SMALL base the
        # binary-search fallback (O(|base| log df) per term) is cheaper
        if universe is not None and base.ids.size * 8 > universe.size:
            if isinstance(a_node, Term):
                base_ranks = self._term_ranks(a_node.term.lower(), base.ids)
            else:
                br = np.searchsorted(universe, base.ids)
                if int(br[-1]) < universe.size and np.array_equal(
                    universe[br], base.ids
                ):
                    base_ranks = br
        if base_ranks is not None:
            total = np.zeros(universe.size)
            inbase = np.zeros(universe.size, dtype=bool)
            inbase[base_ranks] = True
            ok = True
            for t in terms:
                ss = self._score_term(t)
                if ss.ids.size == 0:
                    continue
                ranks = self._term_ranks(t, ss.ids)
                if ranks is None:
                    ok = False
                    break
                m = inbase[ranks]
                total[ranks[m]] += ss.scores[m]
            if ok:
                sel = np.flatnonzero(total)  # BM25 scores strictly positive
                # sel ⊆ base_ranks (total only accumulates where inbase),
                # so a dense scatter of the base scores replaces the
                # O(|sel| log |base|) binary search (measured 29 ms vs
                # ~8 ms at 1 M-df terms over a 1.28 M-doc universe); the
                # gathered values are the same float64 objects, so sums
                # stay bit-identical. np.empty is safe: only base_ranks
                # positions are written and only sel ⊆ base_ranks is read.
                base_dense = np.empty(universe.size)
                base_dense[base_ranks] = base.scores
                return _ScoreSet(universe[sel], base_dense[sel] + total[sel])
        # fallback: binary-search each term against the base id set (same
        # t1,t2,…-then-base float order as the rank path / oracle)
        orsum = np.zeros(base.ids.size)
        matched = np.zeros(base.ids.size, dtype=bool)
        for t in terms:
            ss = self._score_term(t)
            if ss.ids.size == 0:
                continue
            idx = np.searchsorted(ss.ids, base.ids)
            np.minimum(idx, ss.ids.size - 1, out=idx)
            m = ss.ids[idx] == base.ids
            matched |= m
            orsum[m] += ss.scores[idx[m]]
        return _ScoreSet(
            base.ids[matched], base.scores[matched] + orsum[matched]
        )

    def _rank_keys_cached(self, term: str, tp) -> np.ndarray:
        """Read-through LRU over phrase.rank_keys, identity-validated
        against the positions decode (same invalidation rule as the
        scores/ranks caches). The TermPositions ref is held in a LIST so
        its bytes charge the positions cache, not this one."""
        from .phrase import rank_keys

        hit = self._pkey_cache.get(term)
        if hit is not None and hit[0][0] is tp:
            return hit[1]
        keys = rank_keys(tp, self.all_doc_ids())
        self._pkey_cache.put(term, ([tp], keys))
        return keys

    def _phrase_match(self, norm: List[str], positions) -> np.ndarray:
        """Adjacency match set: rank-key fast path (per-term cacheable,
        scalar-offset slot intersections) when the live doc universe is
        driver-resident; the per-query packed-key kernel otherwise. Both
        share phrase.py semantics — parity pinned by tests."""
        from .phrase import match_phrase, match_phrase_ranked

        if self._all_ids is None and self.engine.N > self.meta_limit:
            return match_phrase(norm, positions)
        keys_of = {}
        for t in set(norm):
            tp = positions.get(t)
            if tp is None or tp[0].size == 0:
                return np.empty(0, dtype=np.int64)
            keys_of[t] = self._rank_keys_cached(t, tp)
        return match_phrase_ranked(norm, keys_of, self.all_doc_ids())

    def _eval_phrase(self, terms: List[str], positions) -> _ScoreSet:
        norm = [(t or "").lower() for t in terms]
        if not norm or any(not t.strip() for t in norm):
            return _ScoreSet.empty()
        scored = {t: self._score_term(t) for t in set(norm)}
        first = scored[norm[0]]
        if first.ids.size == 0:
            return _ScoreSet.empty()
        # vectorized adjacency over the position index (QueryEngine.java:
        # 309-341 semantics, shared with the distributed kernel); positions
        # are not tombstone-filtered, so restrict to the LIVE candidate set
        # (the first term's live postings — same seed as the reference).
        # The raw match set is LRU-cached keyed to the per-term decode
        # IDENTITIES (same invalidation rule as the scores/ranks caches):
        # adjacency depends only on the position arrays, so a warm repeat
        # skips the kernel entirely; tombstone/live filtering stays outside
        # the cached value and is applied fresh below.
        key = " ".join(norm)  # terms never contain whitespace
        tps = [positions.get(t) for t in sorted(set(norm))]
        hit = self._phrase_cache.get(key)
        if hit is not None and len(hit[0]) == len(tps) and all(
            a is b for a, b in zip(hit[0], tps)
        ):
            marr = hit[1]
        else:
            marr = self._phrase_match(norm, positions)
            # the list holds the TermPositions refs for identity validation
            # without their bytes charging this cache's budget (they are
            # owned by _positions_cache)
            self._phrase_cache.put(key, (tps, marr))
        marr = marr[member_mask(marr, first.ids)]
        if marr.size == 0:
            return _ScoreSet.empty()
        total = np.zeros(marr.size)
        for t in norm:  # per-occurrence sum, duplicates add twice
            ss = scored[t]
            if ss.ids.size == 0:
                continue
            # marr is small post-match: binary-search it into each term's
            # (possibly df→N sized) id array instead of intersect1d's
            # concat-and-sort of the full postings
            idx = np.searchsorted(ss.ids, marr)
            np.minimum(idx, max(ss.ids.size - 1, 0), out=idx)
            m = ss.ids[idx] == marr
            total[m] += ss.scores[idx[m]]
        return _ScoreSet(marr, total)

    def _eval_field(self, node: Field) -> _ScoreSet:
        key = ("f", node.field, node.value)
        ids = self._filter_ids_cache.get(key)
        if ids is not None:
            return _ScoreSet(ids, np.ones(ids.size))
        ss = self._eval_field_uncached(node)
        if len(self._filter_ids_cache) >= 256:
            self._filter_ids_cache.pop(next(iter(self._filter_ids_cache)))
        self._filter_ids_cache[key] = ss.ids
        return ss

    def _eval_field_uncached(self, node: Field) -> _ScoreSet:
        m = self.meta()
        f, v = node.field, node.value
        if f == "path":
            mask = m["path"].str.startswith(v.replace("\\", "/"))
        elif f in ("ext", "lang"):
            mask = m["lang"].str.lower() == v.lower()
        elif f == "repo":
            mask = m["repo"] == v
        elif f in ("filename", "name"):
            lv = v.lower()
            lp = m["path"].str.lower()
            mask = (lp == lv) | lp.str.endswith("/" + lv)
        elif f == "type":
            tv = v.upper()
            if tv not in {"CODE", "NOTE", "DOC", "DATA", "CONFIG", "OTHER"}:
                return _ScoreSet.empty()
            mask = m["doc_type"] == tv
        else:
            return _ScoreSet.empty()
        ids = np.sort(m.loc[mask, "doc_id"].to_numpy(dtype=np.int64))
        return _ScoreSet(ids, np.ones(ids.size))

    def _eval_range(self, node: Range) -> _ScoreSet:
        key = ("r", node.field, node.lo, node.hi)
        ids = self._filter_ids_cache.get(key)
        if ids is not None:
            return _ScoreSet(ids, np.ones(ids.size))
        ss = self._eval_range_uncached(node)
        if len(self._filter_ids_cache) >= 256:
            self._filter_ids_cache.pop(next(iter(self._filter_ids_cache)))
        self._filter_ids_cache[key] = ss.ids
        return ss

    def _eval_range_uncached(self, node: Range) -> _ScoreSet:
        m = self.meta()
        try:
            if node.field == "size":
                lo, hi = int(node.lo), int(node.hi)
                mask = (m["size_bytes"] >= lo) & (m["size_bytes"] <= hi)
            elif node.field == "mtime":
                lo_t = datetime.fromisoformat(node.lo.replace("Z", "+00:00"))
                hi_t = datetime.fromisoformat(node.hi.replace("Z", "+00:00"))
                mt = pd.to_datetime(m["mtime"], utc=True)
                mask = (mt >= lo_t.astimezone(timezone.utc)) & (
                    mt <= hi_t.astimezone(timezone.utc)
                )
            else:
                return _ScoreSet.empty()
        except (ValueError, TypeError):
            return _ScoreSet.empty()
        ids = np.sort(m.loc[mask.fillna(False), "doc_id"].to_numpy(dtype=np.int64))
        return _ScoreSet(ids, np.ones(ids.size))

    # ---------------------------------------------------------------- public
    def _query_shape(self, ast: Node):
        terms, prefixes, phrase_terms = set(), set(), set()
        for n in _walk(ast):
            if isinstance(n, Term):
                terms.add(n.term.lower())
            elif isinstance(n, Prefix):
                prefixes.add(n.prefix.lower())
            elif isinstance(n, Phrase):
                phrase_terms.update((t or "").lower() for t in n.terms)
        return terms, prefixes, phrase_terms

    def can_execute(self, ast: Node, sort=None) -> bool:
        """Route to this tier only when the query's driver-side collect is
        bounded: metadata volume under ``meta_limit`` AND the postings /
        position payload bytes of its terms (from the in-memory dictionary)
        under the byte budgets. A hot-df term or fat phrase routes to the
        distributed tiers no matter how big the corpus grows — the old
        N-only gate let a df→N term collect unboundedly.

        ``sort`` is the parsed sort directive (querydsl.Sort or None):
        serving ``sort:mtime`` / ``sort:size`` materializes the full doc
        metadata frame (meta() = N-row toPandas), so a metadata-backed sort
        must pass the same meta_limit gate as AST metadata nodes — the AST
        alone never reveals it."""
        needs_meta = self._needs_meta(ast) or (
            sort is not None and getattr(sort, "field", None) in ("mtime", "size")
        )
        if needs_meta and self.engine.N > self.meta_limit:
            return False
        terms, prefixes, phrase_terms = self._query_shape(ast)
        post_terms = {t for t in (terms | phrase_terms) if t.strip()}
        if not post_terms and not prefixes:
            return True  # pure metadata query; meta gate already passed
        if not self._load_dictionary():
            # vocabulary too large for a driver-side dictionary → only a
            # small corpus is safe to serve locally
            return self.engine.N <= self.meta_limit
        # route on the query's TOTAL postings volume (cached or not): the
        # driver pays that volume again at every evaluation (numpy scoring
        # scales with Σ df), so routing must be a pure function of the
        # query + dictionary — a multi-hot-term OR belongs on executors
        # even when its postings happen to be cached
        need = 0
        for t in sorted(post_terms):
            need += self._term_bytes(self._dict_terms, self._dict_bytes, t)
        for p in sorted(prefixes):
            if not p.strip():
                continue
            need += self._range_bytes(self._dict_terms, self._dict_bytes, p, p + "￿")
        if need > self.postings_byte_budget:
            return False
        live_ph = {t for t in phrase_terms if t.strip()}
        if live_ph:
            if not self._load_pos_dictionary():
                return self.engine.N <= self.meta_limit
            pneed = sum(
                self._term_bytes(self._pos_terms, self._pos_bytes, t)
                for t in sorted(live_ph)
            )
            if pneed > self.positions_byte_budget:
                return False
        return True

    def execute(
        self, query: str, limit: int = 10
    ) -> Tuple[List[Tuple[int, float]], int]:
        limit = max(0, min(limit, MAX_SEARCH_LIMIT))
        result = querydsl.parse(query)
        self._prefix_terms = {}
        self._query_postings = {}
        ast = result.ast
        terms = sorted(querydsl.extract_query_terms(ast))
        prefixes = sorted({n.prefix.lower() for n in _walk(ast) if isinstance(n, Prefix)})
        plain = sorted(set(terms) - set(prefixes)) if prefixes else terms
        phrase_terms = [
            t.lower() for n in _walk(ast) if isinstance(n, Phrase) for t in n.terms
        ]
        # phrase first-touch pays TWO driver collects (postings + position
        # blobs); they are independent Spark jobs, so overlap them — the
        # positions fetch runs on a side thread while fetch_terms collects
        # (both only touch lock-guarded LRUs; Spark submits are thread-safe)
        pos_future = None
        if phrase_terms and any(
            t.strip() and t not in self._positions_cache
            for t in set(phrase_terms)
        ):
            pos_future = self._fetch_pool().submit(
                self._positions_for, phrase_terms
            )
        self.fetch_terms(plain, prefixes)
        if pos_future is not None:
            positions = pos_future.result()
        else:
            positions = self._positions_for(phrase_terms) if phrase_terms else {}
        res = self._eval(ast, positions)
        total = int(res.ids.size)
        if result.sort is not None and result.sort.field in ("mtime", "size"):
            uids, vals = self._sort_key_arrays(result.sort.field)
            # every matched id exists in the doc universe (same build), so
            # a binary search replaces the pandas .loc hash reindex
            # (~2 ms/query at 50k docs)
            keys = vals[np.searchsorted(uids, res.ids)]
            order = _topk_order(res.ids, keys, limit)  # int64 keys stay exact
        else:
            order = _topk_order(res.ids, res.scores, limit)
        return [
            (int(res.ids[i]), float(res.scores[i])) for i in order
        ], total


def _walk(node: Node):
    yield node
    if isinstance(node, Bool):
        yield from _walk(node.left)
        yield from _walk(node.right)
    elif isinstance(node, Not):
        yield from _walk(node.child)
