"""Query execution: AST → the serving tiers over one on-disk index.

Four tiers, auto-routed by :meth:`SearchEngine.search_result`:

* **local** (lse.local_exec) — driver-side numpy; admitted only when the
  query's postings/positions payload fits the byte budgets (routing
  dictionary lookup), so a hot-df term can never OOM the driver.

* **bucket** (:meth:`SearchEngine._serve_buckets`) — CNF term queries
  (AND-of-OR-groups, with Prefix leaves expanded via the dictionary) and
  phrases, optionally AND-ed with metadata filters: ONE ``applyInPandas``
  per doc-range bucket does decode → numpy BM25 → bucket top-k + exact
  match count; the driver folds k·B rows. Exact under tombstones and
  delta segments via a live-df map.

* **WAND** (:meth:`SearchEngine.search_topk` with ``strategy="wand"``) —
  block-max kernels (lse.wand): range-bulk BMW for OR, document-at-a-time
  intersection for AND; per-128-doc bounds prune whole ranges.

* **compiler** (:meth:`SearchEngine.compile`) — every DSL node becomes a
  declarative DataFrame expression (Catalyst optimizes, filters push down
  to the term-sorted parquet scan; BM25 runs in Spark SQL codegen). The
  general path: full AST (boolean, NOT, field, range, phrase, prefix,
  sort directives) and arbitrarily large results; the tier the DuckDB
  oracle validates.

All tiers are rank-identical and score-equal (±1e-9) to each other and to
the reference replica (lse.oracle).

Semantics parity map (reference QueryEngine.java):
  Term :211-242   Prefix :244-259  Phrase :261-341  Bool :194-207
  NOT :181-190    Field :343-368   Range :370-395   sort :133-157
Scores are BM25 with global df, N, avgdl (scoring/BM25Scorer.java:31-42);
final order is (score desc, doc_id asc) — the pinned deterministic
tie-break (SURVEY.md §2.5).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from datetime import datetime, timezone
from functools import reduce
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import querydsl
from .codec import decode_postings
from .constants import BM25_B, BM25_K1, MAX_SEARCH_LIMIT
from .ids import member_mask
from .querydsl import Bool, Field, Node, Not, Phrase, Prefix, Range, Term
from .wand import TermCursor, wand_topk_and, wand_topk_bulk

# AQE toggling is session-global; concurrent serving queries must not
# interleave their set/restore pairs (an unbalanced restore would leave AQE
# off for a subsequent build job, or on for a serving job). Depth-counted
# guard per SparkSession: the OUTERMOST serving query saves and restores.
_AQE_LOCK = threading.Lock()
_AQE_STATE: Dict[int, list] = {}  # id(session) -> [depth, saved_value]

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
        T.StructField("df", T.LongType()),
    ]
)

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

# bucket-serving kernel output: kind 0 = a top-k row, kind 1 = the bucket's
# exact match count (doc_id carries the count)
_SERVE_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _decode_rows(batches: Iterable[pd.DataFrame]):
    for pdf in batches:
        outs = []
        for payload, df_shard, df_global, term in zip(
            pdf["payload"], pdf["df_shard"], pdf["df"], pdf["term"]
        ):
            ids, tfs, dls = decode_postings(bytes(payload), int(df_shard))
            outs.append(
                pd.DataFrame(
                    {
                        "term": term,
                        "doc_id": ids,
                        "tf": tfs.astype("int32"),
                        "dl": dls.astype("int32"),
                        "df": np.int64(df_global),
                    }
                )
            )
        yield pd.concat(outs) if outs else pd.DataFrame(
            {c.name: pd.Series(dtype="object") for c in _DECODED_SCHEMA}
        )


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        # a crash between compact's two swap renames leaves the intact
        # pre-compaction index at <index_dir>.old — roll it back; when the
        # index is healthy this also reaps stale .old/.compacting leftovers
        # promptly instead of waiting for the next compact
        # (maintenance.recover_index_dir documents the protocol)
        from .maintenance import _segments as _ms_segments
        from .maintenance import recover_index_dir

        recover_index_dir(index_dir, reap_tmp=False)
        # segments: the base index + active incremental delta segments per
        # the deltas/SEGMENTS.json manifest (listdir fallback); a doc lives
        # in exactly one segment (maintenance.apply_incremental /
        # maintenance.merge_deltas)
        segments = _ms_segments(index_dir)
        self.segments = segments
        self.multi_segment = len(segments) > 1

        def union_tables(name: str):
            dfs = [
                spark.read.parquet(os.path.join(s, name))
                for s in segments
                if os.path.exists(os.path.join(s, name, "_SUCCESS"))
            ]
            if not dfs:
                return None
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d, allowMissingColumns=True)
            return out

        self.postings = union_tables("postings")
        self.doc_stats = union_tables("doc_stats")
        self.stats = spark.read.parquet(os.path.join(index_dir, "stats")).first().asDict()
        if self.multi_segment:
            agg = self.doc_stats.agg(
                F.count("*").alias("n"), F.sum("token_count").alias("t")
            ).first()
            self.stats = dict(
                self.stats, n_docs=int(agg["n"]), total_tokens=int(agg["t"] or 0),
                avgdl=(float(agg["t"] or 0) / agg["n"]) if agg["n"] else 0.0,
            )
        # positions are CO-WRITTEN columns of the postings table (one build
        # shuffle, parquet column pruning for posting-only scans); the
        # "positions table" downstream code reads is this projection
        self.positions = self._positions_view()
        # tombstones: deleted docs are excluded live, and N/avgdl shrink to
        # the live corpus — matching the reference's live-doc filtering
        # (QueryEngine.java:435-443) where deletes update the DocumentTable
        tomb_dir = os.path.join(index_dir, "tombstones")
        if os.path.exists(tomb_dir):
            self.tombs_df = spark.read.parquet(tomb_dir).select("doc_id").distinct()
            self.tomb_ids = np.sort(
                np.array([r["doc_id"] for r in self.tombs_df.collect()], dtype=np.int64)
            )
        else:
            self.tombs_df = None
            self.tomb_ids = np.empty(0, dtype=np.int64)
        # one executor-side copy of the tombstone set for numpy kernels —
        # never a per-plan literal list, never re-pickled per closure
        self._tomb_bc = spark.sparkContext.broadcast(self.tomb_ids)
        # analyzed serving plans keyed by (tier, query shape, k) — see
        # _memo_collect; plans only, never data; lock: serving may be
        # multi-threaded and LRU mutation spans several dict operations
        self._plan_memo: "OrderedDict" = OrderedDict()
        self._plan_memo_lock = threading.Lock()
        n_docs = int(self.stats["n_docs"])
        total_tokens = int(self.stats.get("total_tokens") or 0)
        if self.tomb_ids.size:
            dead = self.doc_stats.join(
                F.broadcast(self.tombs_df), "doc_id", "left_semi"
            ).agg(F.count("*"), F.sum("token_count")).first()
            n_dead, dead_tokens = int(dead[0]), int(dead[1] or 0)
            n_docs -= n_dead
            total_tokens -= dead_tokens
            self.doc_stats = self.doc_stats.join(
                F.broadcast(self.tombs_df), "doc_id", "left_anti"
            )
            self.N = max(n_docs, 1)
            self.avgdl = max(
                (total_tokens / n_docs) if n_docs > 0 else 0.0, 1.0
            )
        else:
            self.N = max(n_docs, 1)
            self.avgdl = max(float(self.stats["avgdl"]), 1.0)
        self._local = None

    def _positions_view(self) -> Optional[DataFrame]:
        if not self.stats.get("with_positions"):
            return None
        return self.postings.filter(F.col("pos_payload").isNotNull()).select(
            "term",
            "bucket",
            F.col("pos_n_docs").alias("n_docs"),
            F.col("pos_payload").alias("payload"),
        )

    @property
    def local(self):
        """Lazy low-latency serving tier (lse.local_exec). Budgets are
        configurable per session via spark.lse.local.* so a deployment can
        match them to its driver memory (admission stays a pure function of
        query + dictionary — the conf only scales the thresholds)."""
        if self._local is None:
            from .local_exec import LocalExecutor

            def geti(key: str, default: int) -> int:
                try:
                    v = self.spark.conf.get(key, None)
                    return default if v is None else int(v)
                except Exception:
                    return default

            p = "spark.lse.local."
            self._local = LocalExecutor(
                self,
                meta_limit=geti(p + "metaLimit", 2_000_000),
                postings_byte_budget=geti(p + "postingsByteBudget", 256 << 20),
                positions_byte_budget=geti(p + "positionsByteBudget", 256 << 20),
                dict_row_limit=geti(p + "dictRowLimit", 2_000_000),
                dict_byte_budget=geti(p + "dictByteBudget", 256 << 20),
                cache_byte_budget=geti(p + "cacheByteBudget", 4 << 30),
            )
        return self._local

    def warm(
        self,
        prefetch_terms: int = 128,
        prefetch_positions: int = 64,
    ) -> "SearchEngine":
        """Pin the query-facing tables on the executors (MEMORY_AND_DISK)
        and materialize them — the serving analog of the reference keeping
        its segments open in-process (QueryEngine.java:211-242). Postings /
        positions are REPARTITIONED BY BUCKET first, so the serving kernels'
        ``groupBy("bucket")`` finds the required hash distribution already
        satisfied and Catalyst elides the per-query exchange: a warm top-k
        is ONE stage (cached scan → kernel → TakeOrdered). Also primes the
        local tier's routing dictionary so `can_execute` never pays a lazy
        first-query job."""
        from pyspark import StorageLevel

        from .mempool import enable_heap_pooling

        # serving mode: pool freed kernel temps on the heap so first-touch
        # queries don't pay mmap re-fault + page-zeroing per fresh phrase
        enable_heap_pooling()
        n_buckets = max(int(self.stats.get("n_buckets", 8)), 1)
        # repartition by bucket for exchange elision, but SORT WITHIN each
        # partition by term: cached batches then carry tight term min/max
        # stats, so a query's `term IN (…)` still prunes whole batches — a
        # bucket-only layout would force every term lookup to scan the
        # entire cache
        # HASH-partition by bucket, but into a partition count where
        # murmur3 maps every bucket value to a DISTINCT partition: B
        # distinct buckets hashed into B partitions collide (~3 empty
        # partitions at B=8, stragglers serially running 2-3 buckets'
        # kernels — measured 2x on the forced top-k latency). Range
        # partitioning would also be collision-free but
        # RangeShuffleSpec is never co-partition-compatible across two
        # scans, which would re-insert an Exchange under the phrase
        # tier's postings⋈positions cogroup; HashPartitioning keeps both
        # the groupBy and the cogroup exchange-free
        # (tests/test_warm_plans.py) and the empty extra partitions cost
        # one ~ms no-op task each, all in parallel.
        n_parts = self._collision_free_partitions(n_buckets)
        self.postings = (
            self.postings.repartition(n_parts, "bucket")
            .sortWithinPartitions("term")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self.postings.count()
        # the positions view projects the SAME cached table — re-derive it
        # so it scans the persisted copy (no second cache)
        self.positions = self._positions_view()
        self.doc_stats = self.doc_stats.persist(StorageLevel.MEMORY_AND_DISK)
        self.doc_stats.count()
        self.local._load_dictionary()
        self.local._load_pos_dictionary()
        if self.N <= self.local.meta_limit:
            self.local.meta()  # pre-pay the one-time metadata collect
            self.local.all_doc_ids()  # …and the NOT path's universe array
        # head-of-Zipf cache warming: the query mix's hot terms are, with
        # overwhelming probability, the highest-df terms — prefetch the top
        # ``prefetch_terms`` postings (and top ``prefetch_positions``
        # position blobs, the phrase path) into the local tier's LRUs in
        # ONE batched collect each, so FIRST-touch queries over common
        # terms serve at warm latency instead of paying a per-query Spark
        # job. Byte-capped: prefetch stops once the predicted decoded
        # volume would crowd the LRU (decoded postings ≈ 16× payload
        # bytes), so a huge corpus warms partially rather than evicting
        # itself. Pass 0/0 to skip.
        self._prefetch_hot_terms(prefetch_terms, prefetch_positions)
        # pre-run one tiny query per distributed tier: spins up the python
        # workers, JITs the kernels, and fills Spark's task-serialization
        # caches so the FIRST real query pays ~warm latency, not 1-8 s
        # (first-touch ≤ 2× warm — VERDICT r2 #8)
        if self.local._dict_terms is not None and len(self.local._dict_terms):
            t = str(self.local._dict_terms[0])
            try:
                self._serve_buckets(querydsl.parse(t).ast, 1)
                if not self.tomb_ids.size and not self.multi_segment:
                    self.search_topk(t, 1, strategy="wand")
                if self.positions is not None:
                    self._serve_phrase_buckets([t, t], [], 1)
            except Exception:  # pragma: no cover — warm must never fail a load
                pass
        return self

    def _collision_free_partitions(self, n_buckets: int) -> int:
        """Smallest partition count in [n_buckets, 4·n_buckets] for which
        Spark's murmur3 hash sends every bucket id to a distinct
        partition (pmod(hash(b), N) all-distinct). One tiny driver-side
        job to read the engine's own hash values — no reimplementation
        that could drift from the JVM. Falls back to n_buckets."""
        try:
            rows = (
                self.spark.createDataFrame(
                    [(i,) for i in range(n_buckets)], "b int"
                )
                .select(F.hash("b").alias("h"))
                .collect()
            )
            hashes = [r["h"] for r in rows]
            for n in range(n_buckets, 4 * n_buckets + 1):
                if len({((h % n) + n) % n for h in hashes}) == n_buckets:
                    return n
        except Exception:  # pragma: no cover — warm must never fail a load
            pass
        return n_buckets

    def _prefetch_hot_terms(self, n_terms: int, n_positions: int) -> None:
        """Fill the local tier's decoded LRUs with the highest-df terms.

        Selection is by the routing dictionary's df column (postings) and
        payload bytes (positions); the cumulative PAYLOAD budget is sized
        so the decoded arrays (≈16× payload) fill at most half the LRU —
        warming must accelerate the head, never evict the session's own
        working set."""
        loc = self.local
        if loc._dict_terms is None or not len(loc._dict_terms):
            return
        try:
            if n_terms > 0:
                order = np.argsort(loc._dict_df)[::-1]
                budget = min(
                    loc.postings_byte_budget,
                    loc._postings_cache.byte_budget // 32,
                )
                picked, used = [], 0
                for i in order[:n_terms]:
                    b = int(loc._dict_bytes[i])
                    if used + b > budget and picked:
                        break
                    used += b
                    picked.append(str(loc._dict_terms[i]))
                if picked:
                    loc.fetch_terms(sorted(picked), [])
                    # prime the derived caches too (BM25 score arrays +
                    # universe ranks) — first-touch then equals warm
                    for t in picked:
                        ss = loc._score_term(t)
                        if loc._all_ids is not None and ss.ids.size:
                            loc._term_ranks(t, ss.ids)
            if (
                n_positions > 0
                and self.positions is not None
                and loc._load_pos_dictionary()
            ):
                order = np.argsort(loc._pos_bytes)[::-1]
                budget = min(
                    loc.positions_byte_budget,
                    # measured decode expansion is ~8× payload (int64 ids/
                    # counts/flat vs varbyte), so /16 keeps the decoded
                    # prefetch at ≤ half the LRU — /32 was double-counting
                    loc._positions_cache.byte_budget // 16,
                )
                picked, used = [], 0
                for i in order[:n_positions]:
                    b = int(loc._pos_bytes[i])
                    if used + b > budget and picked:
                        break
                    used += b
                    picked.append(str(loc._pos_terms[i]))
                if picked:
                    pos = loc._positions_for(sorted(picked))
                    # prebuild the per-term rank-key arrays (the phrase
                    # kernel's only per-term cost) and pre-run one
                    # adjacency intersect: first REAL phrases over hot
                    # terms then run at steady-state kernel speed
                    if loc._all_ids is not None or self.N <= loc.meta_limit:
                        for t in picked:
                            loc._rank_keys_cached(t, pos[t])
                        if len(picked) >= 2:
                            loc._phrase_match(picked[:2], pos)
        except Exception:  # pragma: no cover — warm must never fail a load
            pass

    def _memo_collect(self, key, builder) -> list:
        """Collect a serving plan through a small plan-memo LRU.

        Building + analyzing a fresh applyInPandas plan (UDF pickle, py4j
        chatter, Catalyst analysis) costs ~0.1 s per query — a third of the
        distributed tiers' job floor. Serving plans are pure functions of
        (query shape, k) and engine-static state (segments, tombstones,
        N/avgdl are fixed per SearchEngine instance), so repeat query
        shapes reuse the analyzed DataFrame and pay only job execution.
        The memo holds plans, not data; 64 entries, LRU-evicted."""
        with self._plan_memo_lock:
            df = self._plan_memo.get(key)
            if df is not None:
                self._plan_memo.move_to_end(key)
        if df is None:
            df = builder()  # plan construction outside the lock (py4j I/O)
            with self._plan_memo_lock:
                self._plan_memo[key] = df
                while len(self._plan_memo) > 64:
                    self._plan_memo.popitem(last=False)
        with self._serving_conf():
            return df.collect()

    def _serving_conf(self):
        """Context manager: disable AQE while planning a latency-path query.
        AQE's re-optimization loop costs ~0.1-0.2 s per job — worth it for
        the build's big shuffles, pure overhead for a k-row serving job on
        pre-partitioned cached data. Concurrency-safe: a depth-counted
        per-session guard means overlapping serving queries share one
        save/restore pair instead of interleaving theirs."""
        from contextlib import contextmanager

        @contextmanager
        def cm():
            key = "spark.sql.adaptive.enabled"
            sid = id(self.spark)
            with _AQE_LOCK:
                st = _AQE_STATE.get(sid)
                if st is None:
                    st = _AQE_STATE[sid] = [0, self.spark.conf.get(key, "true")]
                    self.spark.conf.set(key, "false")
                st[0] += 1
            try:
                yield
            finally:
                with _AQE_LOCK:
                    st = _AQE_STATE[sid]
                    st[0] -= 1
                    if st[0] == 0:
                        self.spark.conf.set(key, st[1])
                        del _AQE_STATE[sid]

        return cm()

    # ------------------------------------------------------------ utilities
    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], "doc_id long, score double")

    def _score_expr(self):
        """BM25 in Spark SQL — identical formula/floors to bm25.score."""
        n = F.lit(float(self.N))
        df_b = F.greatest(F.lit(0.0), F.least(F.col("df").cast("double"), n))
        idf = F.log((n - df_b + 0.5) / (df_b + 0.5) + 1.0)
        dl = F.greatest(F.col("dl").cast("double"), F.lit(0.0))
        norm = F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (dl / F.lit(self.avgdl))
        tf = F.col("tf").cast("double")
        return F.when(
            tf > 0, idf * (tf * F.lit(BM25_K1 + 1.0)) / (tf + F.lit(BM25_K1) * norm)
        ).otherwise(F.lit(0.0))

    def _decoded(self, postings: DataFrame) -> DataFrame:
        out = postings.select("term", "payload", "df_shard", "df").mapInPandas(
            _decode_rows, _DECODED_SCHEMA
        )
        if self.tomb_ids.size or self.multi_segment:
            from pyspark.sql import Window

            # drop dead postings, then df must be the LIVE GLOBAL document
            # frequency across segments (the reference recomputes global df
            # over live docs per query, QueryEngine.java:445-463). Tombstones
            # join as a BROADCAST anti-join — a literal isin list would bloat
            # the plan (and break it) for large delete sets
            if self.tomb_ids.size:
                out = out.join(F.broadcast(self.tombs_df), "doc_id", "left_anti")
            out = out.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        return out

    def _scored_terms(self, terms: Sequence[str]) -> DataFrame:
        """(term, doc_id, score) for the given normalized terms."""
        terms = [t for t in {t.lower() for t in terms} if t.strip()]
        if not terms:
            return self.spark.createDataFrame([], "term string, doc_id long, score double")
        rows = self.postings.filter(F.col("term").isin(terms))
        return self._decoded(rows).select(
            "term", "doc_id", self._score_expr().alias("score")
        )

    # ------------------------------------------------------- node evaluation
    def compile(self, node: Node) -> DataFrame:
        """AST → DataFrame(doc_id, score)."""
        if isinstance(node, Term):
            t = node.term.lower()
            if not t.strip():
                return self._empty()
            return self._scored_terms([t]).select("doc_id", "score")
        if isinstance(node, Prefix):
            p = node.prefix.lower()
            if not p.strip():
                return self._empty()
            rows = self.postings.filter(F.col("term").startswith(p))
            return (
                self._decoded(rows)
                .select("doc_id", self._score_expr().alias("score"))
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        if isinstance(node, Phrase):
            return self._compile_phrase(list(node.terms))
        if isinstance(node, Field):
            return self._compile_field(node)
        if isinstance(node, Range):
            return self._compile_range(node)
        if isinstance(node, Not):
            child = self.compile(node.child)
            return (
                self.doc_stats.select("doc_id")
                .join(child.select("doc_id"), "doc_id", "left_anti")
                .withColumn("score", F.lit(0.0))
            )
        if isinstance(node, Bool):
            left = self.compile(node.left)
            right = self.compile(node.right)
            if node.op == "AND":
                return (
                    left.alias("l")
                    .join(right.alias("r"), "doc_id", "inner")
                    .select(
                        "doc_id",
                        (F.col("l.score") + F.col("r.score")).alias("score"),
                    )
                )
            return (
                left.unionByName(right)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("score"))
            )
        return self._empty()

    def _compile_phrase(self, terms: List[str]) -> DataFrame:
        # any blank phrase term ⇒ no match at all (reference
        # matchesPhraseInDoc returns false on a blank term; the local/oracle
        # tiers agree) — do NOT just drop blanks and evaluate the rest
        if any(not (t and t.strip()) for t in terms):
            return self._empty()
        terms = [t.lower() for t in terms]
        if not terms or self.positions is None:
            return self._empty()
        # bucket-parallel adjacency kernel (QueryEngine.java:309-341
        # semantics): buckets are doc-ranges aligned across terms by
        # construction, so each bucket's phrase matches are independent —
        # one shuffle of the query terms' position blobs, then pure numpy
        # (lse.phrase.match_phrase) inside each group. Replaces both the
        # old join-per-term chain (a shuffle per phrase term) and any
        # driver-side per-doc loop.
        pos = self.positions.filter(F.col("term").isin(list(set(terms))))
        terms_local = list(terms)
        tomb_bc = self._tomb_bc

        def bucket_match(key, pdf: pd.DataFrame) -> pd.DataFrame:
            from .codec import decode_positions_flat
            from .phrase import filter_tombstones, match_phrase, merge_shards

            shards: dict = {}
            for r in pdf.itertuples(index=False):
                shards.setdefault(r.term, []).append(
                    decode_positions_flat(bytes(r.payload), int(r.n_docs))
                )
            per_term = {
                t: filter_tombstones(merge_shards(s), tomb_bc.value)
                for t, s in shards.items()
            }
            matched_ids = match_phrase(terms_local, per_term)
            return pd.DataFrame({"doc_id": pd.Series(matched_ids, dtype="int64")})

        matched = pos.groupBy("bucket").applyInPandas(bucket_match, "doc_id long")
        # score = Σ member-term BM25 (duplicates in the term list add twice)
        scored = self._scored_terms(terms)
        per_occurrence = [
            scored.filter(F.col("term") == t).select("doc_id", "score") for t in terms
        ]
        summed = (
            reduce(DataFrame.unionByName, per_occurrence)
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )
        return summed.join(matched, "doc_id", "inner").select("doc_id", "score")

    def _compile_field(self, node: Field) -> DataFrame:
        f, v = node.field, node.value
        ds = self.doc_stats
        if f == "path":
            cond = F.col("path").startswith(v.replace("\\", "/"))
        elif f in ("ext", "lang"):
            cond = F.lower(F.col("lang")) == v.lower()
        elif f == "repo":
            cond = F.col("repo") == v
        elif f in ("filename", "name"):
            lv = v.lower()
            cond = (F.lower(F.col("path")) == lv) | F.lower(F.col("path")).endswith(
                "/" + lv
            )
        elif f == "type":
            tv = v.upper()
            if tv not in {"CODE", "NOTE", "DOC", "DATA", "CONFIG", "OTHER"}:
                return self._empty()
            cond = F.col("doc_type") == tv
        else:
            return self._empty()
        return ds.filter(cond).select("doc_id", F.lit(1.0).alias("score"))

    def _compile_range(self, node: Range) -> DataFrame:
        ds = self.doc_stats
        try:
            if node.field == "size":
                lo, hi = int(node.lo), int(node.hi)
                cond = F.col("size_bytes").between(lo, hi)
            elif node.field == "mtime":
                lo_t = datetime.fromisoformat(node.lo.replace("Z", "+00:00"))
                hi_t = datetime.fromisoformat(node.hi.replace("Z", "+00:00"))
                cond = F.col("mtime").between(
                    lo_t.astimezone(timezone.utc).replace(tzinfo=None),
                    hi_t.astimezone(timezone.utc).replace(tzinfo=None),
                )
            else:
                return self._empty()
        except (ValueError, TypeError):
            return self._empty()  # silent, QueryEngine.java:392-394
        return ds.filter(cond).select("doc_id", F.lit(1.0).alias("score"))

    # ---------------------------------------------------------------- search
    def search(self, query: str, limit: int = 10) -> DataFrame:
        """Full DSL search → DataFrame(doc_id, score) in final rank order."""
        limit = max(0, min(limit, MAX_SEARCH_LIMIT))
        result = querydsl.parse(query)
        scores = self.compile(result.ast)
        if result.sort is not None and result.sort.field in ("mtime", "size"):
            field = "size_bytes" if result.sort.field == "size" else "mtime"
            return (
                scores.join(self.doc_stats.select("doc_id", field), "doc_id", "left")
                .orderBy(F.col(field).desc(), F.col("doc_id").asc())
                .select("doc_id", "score")
                .limit(limit)
            )
        return scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(limit)

    def search_result(
        self, query: str, limit: int = 10, mode: str = "auto"
    ) -> Tuple[List[Tuple[int, float]], int]:
        """(top-k [(doc_id, score)], totalMatches) — SearchResult parity.

        Tier routing ('auto'):
        1. local numpy tier when the driver-side collect fits its byte
           budgets (LocalExecutor.can_execute);
        2. distributed bucket tier for term-tree queries (w/ or w/o
           metadata filters) — per-bucket decode+score+count on executors;
        3. the general DataFrame compiler for everything else.
        'local' / 'spark' / 'bucket' force a tier ('spark' = compiler).
        """
        result = querydsl.parse(query)
        if mode == "bucket":
            served = self._serve_buckets(result.ast, limit)
            if served is None:
                raise ValueError("query is not bucket-servable")
            return served
        if mode != "spark" and self.local.can_execute(result.ast, result.sort):
            return self.local.execute(query, limit)
        if mode != "spark" and result.sort is None:
            served = self._serve_buckets(result.ast, limit)
            if served is not None:
                return served
        scores = self.compile(result.ast).cache()
        try:
            total = scores.count()
            top = self.search(query, limit).collect()
            return [(r["doc_id"], r["score"]) for r in top], total
        finally:
            scores.unpersist()

    def search_with_snippets(
        self, query: str, limit: int = 10
    ) -> Tuple[List[dict], int]:
        """Full SearchHit parity (query/QueryEngine.java:90-97): top-k hits
        with metadata + highlighted snippets. Content comes from the docs
        snapshot when the build stored it (store_content=True); snippets are
        generated only for the k result rows — never in the scoring path."""
        from . import snippets as sn

        hits, total = self.search_result(query, limit)
        if not hits:
            return [], total
        terms = querydsl.extract_query_terms(
            querydsl.parse(query).ast
        )
        ids = [d for d, _ in hits]
        meta_rows = {
            r["doc_id"]: r.asDict()
            for r in self.doc_stats.filter(F.col("doc_id").isin(ids)).collect()
        }
        contents: dict = {}
        docs_dir = os.path.join(self.segments[0], "docs")
        docs = self.spark.read.parquet(docs_dir)
        if "content" in docs.columns:
            for seg in self.segments:
                seg_docs = self.spark.read.parquet(os.path.join(seg, "docs"))
                if "content" in seg_docs.columns:
                    for r in (
                        seg_docs.filter(F.col("doc_id").isin(ids))
                        .select("doc_id", "content")
                        .collect()
                    ):
                        contents[r["doc_id"]] = r["content"]
        out = []
        for doc_id, score in hits:
            m = meta_rows.get(doc_id, {})
            content = contents.get(doc_id, "")
            out.append(
                dict(
                    doc_id=doc_id,
                    score=score,
                    repo=m.get("repo"),
                    path=m.get("path"),
                    lang=m.get("lang"),
                    snippets=[
                        dict(text=s.text, line_number=s.line_number, offset=s.offset)
                        for s in sn.generate(content, terms)
                    ],
                )
            )
        return out, total

    # ------------------------------------------------- bucket serving tier
    def _live_df_map(self, terms: Sequence[str]) -> Optional[Dict[str, int]]:
        """LIVE global df per term (QueryEngine.java:445-463 recomputes df
        over live docs per query). Returns None when the build-time ``df``
        column is already exact (single segment, no tombstones) — the common
        case pays NO extra job. Under deltas-only, df is a cheap sum of
        shard dfs; only a live tombstone set forces a decode-and-count pass
        (distributed, restricted to the query's terms). Results are cached
        per engine instance."""
        if not self.tomb_ids.size and not self.multi_segment:
            return None
        if not hasattr(self, "_live_df_cache"):
            self._live_df_cache: Dict[str, int] = {}
        missing = sorted(t for t in set(terms) if t not in self._live_df_cache)
        if missing:
            rows = self.postings.filter(F.col("term").isin(missing))
            if not self.tomb_ids.size:
                got = (
                    rows.groupBy("term").agg(F.sum("df_shard").alias("df")).collect()
                )
            else:
                tomb_bc = self._tomb_bc

                def live_counts(batches: Iterable[pd.DataFrame]):
                    from .ids import member_mask

                    for pdf in batches:
                        outs = []
                        for term, payload, df_shard in zip(
                            pdf["term"], pdf["payload"], pdf["df_shard"]
                        ):
                            ids, _tfs, _dls = decode_postings(
                                bytes(payload), int(df_shard)
                            )
                            n = int((~member_mask(ids, tomb_bc.value)).sum())
                            outs.append((term, n))
                        yield pd.DataFrame(outs, columns=["term", "live"])

                got = (
                    rows.select("term", "payload", "df_shard")
                    .mapInPandas(live_counts, "term string, live long")
                    .groupBy("term")
                    .agg(F.sum("live").alias("df"))
                    .collect()
                )
            found = {r["term"]: int(r["df"]) for r in got}
            for t in missing:
                self._live_df_cache[t] = found.get(t, 0)
        return {t: self._live_df_cache[t] for t in set(terms)}

    def _split_filtered_and(self, node: Node):
        """Decompose an AND-tree into (metadata filter leaves, the single
        term-bearing subtree). Returns (filters, core) or (None, None) when
        the shape doesn't fit (then the general compiler serves it)."""
        filters: List[Node] = []
        cores: List[Node] = []

        def walk(n: Node) -> bool:
            if isinstance(n, Bool) and n.op == "AND":
                return walk(n.left) and walk(n.right)
            if isinstance(n, (Field, Range)):
                filters.append(n)
                return True
            cores.append(n)
            return True

        if not walk(node) or not filters or not cores:
            return (None, None) if not filters else (filters, None)
        core = cores[0]
        for c in cores[1:]:  # several term leaves ⇒ conjunctive core
            core = Bool("AND", core, c)
        return filters, core

    def _collect_filter_ids(self, filters: List[Node]):
        """Intersect metadata-filter doc sets → (sorted int64 ids | None, ok).
        ok=False when the set exceeds the broadcastable cap (the general
        compiler serves it instead — at 100 TB a field filter can match
        billions of docs)."""
        if not filters:
            return None, True
        fdf = reduce(
            lambda a, b: a.join(b, "doc_id", "inner"),
            [self.compile(f).select("doc_id") for f in filters],
        )
        # two-tier probe: the cap check is a COUNT (no driver transfer), so
        # an over-cap filter set never materializes >16 MB on the driver —
        # only a passing set (≤2M ids ≈ 16 MB) is collected
        if fdf.limit(2_000_001).count() > 2_000_000:
            return None, False
        fpdf = fdf.toPandas()
        return np.sort(fpdf["doc_id"].to_numpy(dtype=np.int64)), True

    def _broadcast_filter_ids(self, fid: Optional[np.ndarray]):
        """Ship the (sorted) filter-id set to executors ONCE per query via
        sparkContext.broadcast — the same pattern as the tombstone array.
        Returns None when there is no filter. The caller unpersists after
        its job completes. Kernels test membership with member_mask
        (binary search over the sorted set), never linear np.isin."""
        if fid is None:
            return None
        bc = self.spark.sparkContext.broadcast(fid)
        self._last_filter_bc = bc  # test hook: proves the broadcast path ran
        return bc

    def _serve_phrase_buckets(
        self, terms: List[str], filters: List[Node], limit: int
    ) -> Optional[Tuple[List[Tuple[int, float]], int]]:
        """Phrase serving in ONE job: positions are co-written columns of
        the postings table, so a single ``groupBy(bucket)`` hands the kernel
        BOTH blobs of every (term, bucket). The kernel runs the vectorized
        adjacency matcher, scores matches with member-term BM25, and emits
        bucket top-k + exact count — replacing the compile tier's
        positions-kernel + score-join + count chain (3 jobs)."""
        fid, ok = self._collect_filter_ids(filters)
        if not ok:
            return None
        if fid is not None and fid.size == 0:
            return [], 0
        # ONE executor-side copy of the filter-id set (like the tombstone
        # array) — a closure-captured array would be re-pickled into every
        # task (16 MB per task at the 2M-id cap)
        fid_bc = self._broadcast_filter_ids(fid)
        bonus = float(len(filters))
        distinct = sorted(set(terms))
        dfmap = self._live_df_map(distinct)
        rows = self.postings.filter(F.col("term").isin(distinct)).select(
            "term", "bucket", "payload", "df_shard", "df",
            "pos_n_docs", "pos_payload",
        )
        N, avgdl = self.N, self.avgdl
        k = max(0, min(limit, MAX_SEARCH_LIMIT))
        tomb_bc = self._tomb_bc
        terms_local = list(terms)
        n_distinct = len(distinct)

        def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
            from .codec import decode_positions_flat, raw_bm25_component
            from .ids import member_mask
            from .phrase import (
                filter_tombstones,
                match_phrase,
                merge_shards,
                restrict_ids,
            )

            tomb = tomb_bc.value
            fid = fid_bc.value if fid_bc is not None else None
            empty = pd.DataFrame(
                {
                    "kind": pd.Series(dtype="int32"),
                    "doc_id": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float64"),
                }
            )
            pos_shards: Dict[str, list] = {}
            pshards: Dict[str, list] = {}
            row_df: Dict[str, int] = {}
            for r in pdf.itertuples(index=False):
                pos_shards.setdefault(r.term, []).append(
                    decode_positions_flat(bytes(r.pos_payload), int(r.pos_n_docs))
                )
                ids, tfs, dls = decode_postings(bytes(r.payload), int(r.df_shard))
                if tomb.size:
                    live = ~member_mask(ids, tomb)
                    ids, tfs, dls = ids[live], tfs[live], dls[live]
                if fid is not None:
                    m = member_mask(ids, fid)
                    ids, tfs, dls = ids[m], tfs[m], dls[m]
                pshards.setdefault(r.term, []).append((ids, tfs, dls))
                row_df[r.term] = int(r.df)
            per_term: Dict[str, tuple] = {}
            for t, s in pos_shards.items():
                tp = filter_tombstones(merge_shards(s), tomb)
                if fid is not None:
                    tp = restrict_ids(tp, fid)
                per_term[t] = tp
            matched = match_phrase(terms_local, per_term)
            if matched.size == 0:
                return empty
            merged: Dict[str, tuple] = {}
            for t, s in pshards.items():
                if len(s) == 1:
                    merged[t] = s[0]
                else:
                    ids = np.concatenate([x[0] for x in s])
                    tfs = np.concatenate([x[1] for x in s])
                    dls = np.concatenate([x[2] for x in s])
                    order = np.argsort(ids, kind="stable")
                    merged[t] = (ids[order], tfs[order], dls[order])
            if len(merged) < n_distinct:
                return empty

            score = np.zeros(matched.size)
            for t in terms_local:  # per occurrence — duplicates add twice
                ids, tfs, dls = merged[t]
                dfv = dfmap[t] if dfmap is not None else row_df[t]
                b = min(max(dfv, 0), N)
                idf = float(np.log((N - b + 0.5) / (b + 0.5) + 1.0))
                p = np.searchsorted(ids, matched)
                score += idf * raw_bm25_component(tfs[p], dls[p], avgdl)
            order = np.lexsort((matched, -score))[:k]
            return pd.DataFrame(
                {
                    "kind": np.concatenate(
                        [np.zeros(order.size, dtype="int32"),
                         np.ones(1, dtype="int32")]
                    ),
                    "doc_id": np.concatenate(
                        [matched[order], np.array([matched.size], dtype=np.int64)]
                    ),
                    "score": np.concatenate([score[order], np.zeros(1)]),
                }
            )

        try:
            if fid_bc is None:  # filter-free shape: plan-memo eligible
                coll = self._memo_collect(
                    ("phrase", tuple(terms_local), k),
                    lambda: rows.groupBy("bucket").applyInPandas(
                        kern, _SERVE_SCHEMA
                    ),
                )
            else:
                with self._serving_conf():
                    coll = (
                        rows.groupBy("bucket")
                        .applyInPandas(kern, _SERVE_SCHEMA)
                        .collect()
                    )
        finally:
            if fid_bc is not None:
                fid_bc.unpersist()
        total = sum(int(r["doc_id"]) for r in coll if r["kind"] == 1)
        hits = sorted(
            ((int(r["doc_id"]), float(r["score"])) for r in coll if r["kind"] == 0),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        return [(d, s + bonus) for d, s in hits], total

    def _expand_prefix(self, prefix: str) -> Optional[List[str]]:
        """Dictionary range scan [prefix, prefix+0xFFFF) → matching terms
        (DictionaryReader.java:95-102). Uses the local tier's in-memory
        dictionary when available, else one term-pruned distinct scan.
        None = expansion too large / unavailable (compiler serves it)."""
        cap = 10_000
        if self.local._load_dictionary():
            arr = self.local._dict_terms
            a = int(np.searchsorted(arr, prefix, side="left"))
            b = int(np.searchsorted(arr, prefix + "￿", side="left"))
            if b - a > cap:
                return None
            return [str(t) for t in arr[a:b]]
        rows = (
            self.postings.filter(F.col("term").startswith(prefix))
            .select("term").distinct().limit(cap + 1).collect()
        )
        if len(rows) > cap:
            return None
        return [r["term"] for r in rows]

    # ------------------------------------------------------------ wildcard
    @staticmethod
    def _wildcard_regex(pattern: str) -> str:
        """Glob ('*' only) → anchored regex, identical under Python re and
        Spark's Java rlike (segments are re.escape'd literals)."""
        import re as _re

        return "^" + ".*".join(_re.escape(s) for s in pattern.split("*")) + "$"

    def _expand_wildcard(self, pattern: str, cap: int = 512) -> Optional[List[str]]:
        """Dictionary expansion of a glob pattern. The scan is anchored on
        the literal prefix before the first '*' (so 'sp*k' touches the 'sp'
        dictionary range, not the vocabulary); leading-star patterns scan
        the whole in-memory dictionary. None = over cap or no local
        dictionary (the distributed rlike path serves it instead — at a
        10^8-term vocabulary a driver-side expansion is the wrong plan)."""
        import re as _re

        rx = _re.compile(self._wildcard_regex(pattern))
        pre = pattern.split("*", 1)[0]
        if not self.local._load_dictionary():
            return None
        arr = self.local._dict_terms
        a = int(np.searchsorted(arr, pre, side="left"))
        b = int(np.searchsorted(arr, pre + "￿", side="left")) if pre else len(arr)
        out = [str(t) for t in arr[a:b] if rx.match(str(t))]
        return None if len(out) > cap else out

    def wildcard_scores(self, pattern: str) -> DataFrame:
        """DataFrame(doc_id, score) for a glob term pattern — per-doc BM25
        sum over all matching terms (PrefixQuery scoring generalized,
        QueryEngine.java:244-259; beyond-reference: the reference stops at
        trailing-star prefixes). Distributed plan: postings pruned by the
        anchored literal prefix (pushes to the parquet scan like the
        Prefix compiler path) then rlike on the dictionary-sorted rows —
        never a driver-side term list."""
        p = pattern.lower().strip()
        if not p or p.replace("*", "") == "":
            return self._empty()
        rows = self.postings
        pre = p.split("*", 1)[0]
        if pre:
            rows = rows.filter(F.col("term").startswith(pre))
        rows = rows.filter(F.col("term").rlike(self._wildcard_regex(p)))
        return (
            self._decoded(rows)
            .select("doc_id", self._score_expr().alias("score"))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )

    def search_wildcard(
        self, pattern: str, limit: int = 10
    ) -> Tuple[List[Tuple[int, float]], int]:
        """(top-k [(doc_id, score)], totalMatches) for a glob term query
        ('sp*k', '*tion', 'a*b*c'). Small expansions (≤512 dictionary
        terms) are rewritten to an OR-group DSL string and served through
        the normal tier routing — local numpy tier, plan memo and all;
        over-cap or dictionary-less cases run the distributed
        :meth:`wildcard_scores` plan."""
        p = pattern.lower().strip()
        if not p or p.replace("*", "") == "":
            return [], 0
        if "*" not in p:
            return self.search_result(p, limit)
        terms = self._expand_wildcard(p)
        if terms is not None:
            if not terms:
                return [], 0
            # dictionary terms are tokenizer-emitted [a-z0-9]+ — always
            # lexable as DSL terms, so the OR-group string is safe
            return self.search_result(" OR ".join(terms), limit)
        scores = self.wildcard_scores(p).cache()
        try:
            total = scores.count()
            top = scores.orderBy(F.desc("score"), F.asc("doc_id")).take(limit)
            return [(int(r["doc_id"]), float(r["score"])) for r in top], total
        finally:
            scores.unpersist()

    # ------------------------------------------------------------ fuzzy
    @staticmethod
    def _levenshtein_leq(a: str, b: str, d: int) -> bool:
        """Banded two-row Levenshtein DP with early abandon: True iff
        dist(a,b) ≤ d. O(len·(2d+1)) — candidates already length-banded."""
        la, lb = len(a), len(b)
        if abs(la - lb) > d:
            return False
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            lo = max(1, i - d)
            hi = min(lb, i + d)
            if lo > 1:
                cur[lo - 1] = d + 1
            best = cur[lo - 1] if lo > 1 else cur[0]
            for j in range(lo, hi + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
                best = min(best, cur[j])
            if hi < lb:
                cur[hi + 1:] = [d + 1] * (lb - hi)
            if best > d:
                return False
            prev = cur
        return prev[lb] <= d

    def _expand_fuzzy(
        self, term: str, max_dist: int = 1, cap: int = 512
    ) -> Optional[List[str]]:
        """Dictionary expansion of a fuzzy term: all vocabulary terms
        within Levenshtein distance ``max_dist``. Candidates are pruned to
        the ±d length band with one vectorized numpy pass before the DP
        runs. None = no local dictionary or over cap (the distributed
        levenshtein plan serves it instead)."""
        if not self.local._load_dictionary():
            return None
        arr = self.local._dict_terms
        lens = np.char.str_len(arr.astype(str))
        band = np.abs(lens - len(term)) <= max_dist
        out = [
            str(t)
            for t in arr[band]
            if self._levenshtein_leq(str(t), term, max_dist)
        ]
        return None if len(out) > cap else out

    def fuzzy_scores(self, term: str, max_dist: int = 1) -> DataFrame:
        """DataFrame(doc_id, score) for a fuzzy term query — per-doc BM25
        sum over every vocabulary term within Levenshtein ``max_dist``
        (beyond-reference: typo-tolerant search; same score-sum semantics
        as Prefix/wildcard, QueryEngine.java:244-259). Distributed plan:
        a cheap ±d length-band filter (pushes to the parquet scan) then
        JVM ``levenshtein`` on the survivors — never a driver-side term
        list."""
        t = term.lower().strip()
        if not t:
            return self._empty()
        rows = self.postings.filter(
            F.abs(F.length("term") - F.lit(len(t))) <= max_dist
        ).filter(F.levenshtein(F.col("term"), F.lit(t)) <= max_dist)
        return (
            self._decoded(rows)
            .select("doc_id", self._score_expr().alias("score"))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
        )

    def search_fuzzy(
        self, term: str, max_dist: int = 1, limit: int = 10
    ) -> Tuple[List[Tuple[int, float]], int]:
        """(top-k [(doc_id, score)], totalMatches) for a typo-tolerant term
        query. Small dictionary expansions rewrite to an OR-group DSL
        string and ride the normal tier routing (local numpy tier, plan
        memo); over-cap or dictionary-less cases run the distributed
        :meth:`fuzzy_scores` plan."""
        t = term.lower().strip()
        if not t:
            return [], 0
        terms = self._expand_fuzzy(t, max_dist=max_dist)
        if terms is not None:
            if not terms:
                return [], 0
            return self.search_result(" OR ".join(terms), limit)
        scores = self.fuzzy_scores(t, max_dist).cache()
        try:
            total = scores.count()
            top = scores.orderBy(F.desc("score"), F.asc("doc_id")).take(limit)
            return [(int(r["doc_id"]), float(r["score"])) for r in top], total
        finally:
            scores.unpersist()

    def cnf_groups(self, node: Node) -> Optional[List[List[str]]]:
        """AND-of-OR-groups normalization of a pure term tree (with
        multiplicity — reference score-sum semantics). Covers a single term
        ([[t]]), pure OR (one group), pure AND (singleton groups), the
        common mixed shape ``a AND (b OR c)``, and Prefix leaves (expanded
        into an OR-group via the dictionary — prefix scoring IS a per-doc
        score sum over matching terms, QueryEngine.java:244-259); returns
        None for shapes with AND nested under OR (the general compiler
        serves those)."""
        if isinstance(node, Term):
            return [[node.term.lower()]]
        if isinstance(node, Prefix):
            p = node.prefix.lower()
            if not p.strip():
                return [[]]  # blank prefix matches nothing
            exp = self._expand_prefix(p)
            if exp is None:
                return None
            return [exp]  # may be [] → empty AND branch → no matches
        if isinstance(node, Bool):
            if node.op == "AND":
                left = self.cnf_groups(node.left)
                right = self.cnf_groups(node.right)
                if left is not None and right is not None:
                    return left + right
                return None
            if node.op == "OR":
                flat = self.wand_terms(node, "OR")
                if flat is not None:
                    return [flat]
        return None

    def _core_shape(self, node: Node):
        """('phrase', terms) | ('cnf', groups) when bucket-servable."""
        if isinstance(node, Phrase):
            return ("phrase", [(t or "").lower() for t in node.terms])
        g = self.cnf_groups(node)
        if g is not None:
            return ("cnf", g)
        return None

    def _serve_buckets(
        self, ast: Node, limit: int
    ) -> Optional[Tuple[List[Tuple[int, float]], int]]:
        """Distributed exact serving for term-tree AND phrase queries
        (optionally AND-ed with metadata filters): per doc-range bucket,
        decode → numpy BM25 → bucket top-k + exact match count; the driver
        folds k·B rows. Handles tombstones / delta segments via the live-df
        map — postings and positions NEVER collect to the driver. Returns
        None when the AST shape needs the general compiler."""
        shape = self._core_shape(ast)
        filters: List[Node] = []
        if shape is None:
            filters, core = self._split_filtered_and(ast)
            if filters is None or core is None:
                return None
            shape = self._core_shape(core)
            if shape is None:
                return None
        kind, payload_shape = shape
        if kind == "phrase":
            terms = payload_shape
            if any(not t.strip() for t in terms):
                return [], 0  # blank phrase term ⇒ no match (reference)
            if self.positions is None or not terms:
                return [], 0
            return self._serve_phrase_buckets(terms, filters, limit)
        # CNF groups: doc matches iff EVERY group has ≥1 member term present
        # (AND of ORs); score = Σ over groups of the group's member-score
        # sum — exactly the reference's recursive score-sum semantics
        groups = [[t for t in g if t.strip()] for g in payload_shape]
        if any(not g for g in groups):
            return [], 0  # an all-blank AND branch matches nothing
        if not groups:
            return None
        filter_ids, ok = self._collect_filter_ids(filters)
        if not ok:
            return None  # filter set too large to broadcast — compile
        if filter_ids is not None and filter_ids.size == 0:
            return [], 0
        fid_bc = self._broadcast_filter_ids(filter_ids)
        bonus = float(len(filters))

        distinct = sorted({t for g in groups for t in g})
        dfmap = self._live_df_map(distinct)
        rows = self.postings.filter(F.col("term").isin(distinct))
        N, avgdl, k = self.N, self.avgdl, max(0, min(limit, MAX_SEARCH_LIMIT))
        tomb_bc = self._tomb_bc
        groups_local = [list(g) for g in groups]

        def kern(key, pdf: pd.DataFrame) -> pd.DataFrame:
            from .codec import raw_bm25_component
            from .ids import member_mask

            per_term: Dict[str, list] = {}
            row_df: Dict[str, int] = {}
            tomb = tomb_bc.value
            fid = fid_bc.value if fid_bc is not None else None
            for r in pdf.itertuples(index=False):
                ids, tfs, dls = decode_postings(bytes(r.payload), int(r.df_shard))
                if tomb.size:
                    live = ~member_mask(ids, tomb)
                    ids, tfs, dls = ids[live], tfs[live], dls[live]
                if fid is not None:
                    m = member_mask(ids, fid)
                    ids, tfs, dls = ids[m], tfs[m], dls[m]
                per_term.setdefault(r.term, []).append((ids, tfs, dls))
                row_df[r.term] = int(r.df)

            merged: Dict[str, tuple] = {}
            for t, shards in per_term.items():
                if len(shards) == 1:
                    ids, tfs, dls = shards[0]
                else:
                    ids = np.concatenate([s[0] for s in shards])
                    tfs = np.concatenate([s[1] for s in shards])
                    dls = np.concatenate([s[2] for s in shards])
                    order = np.argsort(ids, kind="stable")
                    ids, tfs, dls = ids[order], tfs[order], dls[order]
                if ids.size:
                    merged[t] = (ids, tfs, dls)

            def idf_of(t: str) -> float:
                dfv = dfmap[t] if dfmap is not None else row_df[t]
                b = min(max(dfv, 0), N)
                return float(np.log((N - b + 0.5) / (b + 0.5) + 1.0))

            empty = pd.DataFrame({"kind": pd.Series(dtype="int32"),
                                  "doc_id": pd.Series(dtype="int64"),
                                  "score": pd.Series(dtype="float64")})
            # per group: union-sum over member terms (duplicates add twice)
            group_sets: List[tuple] = []
            for g in groups_local:
                parts_i, parts_s = [], []
                for t in g:
                    if t not in merged:
                        continue
                    ids, tfs, dls = merged[t]
                    parts_i.append(ids)
                    parts_s.append(idf_of(t) * raw_bm25_component(tfs, dls, avgdl))
                if not parts_i:
                    return empty  # a whole AND branch is absent here
                allids = np.concatenate(parts_i)
                g_ids, inv = np.unique(allids, return_inverse=True)
                g_scores = np.zeros(g_ids.size)
                np.add.at(g_scores, inv, np.concatenate(parts_s))
                group_sets.append((g_ids, g_scores))
            # intersect groups (smallest first), summing group scores
            group_sets.sort(key=lambda t: t[0].size)
            cand = group_sets[0][0]
            for g_ids, _ in group_sets[1:]:
                cand = np.intersect1d(cand, g_ids, assume_unique=True)
                if cand.size == 0:
                    return empty
            out_ids = cand
            out_scores = np.zeros(cand.size)
            for g_ids, g_scores in group_sets:
                out_scores += g_scores[np.searchsorted(g_ids, cand)]
            order = np.lexsort((out_ids, -out_scores))[:k]
            return pd.DataFrame(
                {
                    "kind": np.concatenate(
                        [np.zeros(order.size, dtype="int32"),
                         np.ones(1, dtype="int32")]
                    ),
                    "doc_id": np.concatenate(
                        [out_ids[order], np.array([out_ids.size], dtype=np.int64)]
                    ),
                    "score": np.concatenate([out_scores[order], np.zeros(1)]),
                }
            )

        try:
            if fid_bc is None:  # filter-free shape: plan-memo eligible
                coll = self._memo_collect(
                    ("cnf", tuple(map(tuple, groups_local)), k),
                    lambda: rows.groupBy("bucket").applyInPandas(
                        kern, _SERVE_SCHEMA
                    ),
                )
            else:
                with self._serving_conf():
                    coll = (
                        rows.groupBy("bucket")
                        .applyInPandas(kern, _SERVE_SCHEMA)
                        .collect()
                    )
        finally:
            if fid_bc is not None:
                fid_bc.unpersist()
        total = sum(int(r["doc_id"]) for r in coll if r["kind"] == 1)
        hits = sorted(
            ((int(r["doc_id"]), float(r["score"])) for r in coll if r["kind"] == 0),
            key=lambda t: (-t[1], t[0]),
        )[:k]
        return [(d, s + bonus) for d, s in hits], total

    # --------------------------------------------------------- WAND fast path
    def wand_terms(self, node: Node, op: str = "OR") -> Optional[List[str]]:
        """Terms (WITH multiplicity — a repeated term scores twice, matching
        the reference's score-sum merge) if the AST is a pure tree of ``op``
        over Terms, else None."""
        if isinstance(node, Term):
            return [node.term.lower()]
        if isinstance(node, Bool) and node.op == op:
            l = self.wand_terms(node.left, op)
            r = self.wand_terms(node.right, op)
            if l is not None and r is not None:
                return l + r
        return None

    def choose_topk_strategy(
        self, terms: Sequence[str], conjunctive: bool = False
    ) -> str:
        """'wand' when the one-pass block-bound stats say block-max pruning
        will skip most ranges, else 'bucket'.

        The stats (per-term max / mean / count of the per-128-doc-block
        raw-BM25 maxima, gathered by the routing dictionary's single
        aggregation) estimate the two sides of the WAND pruning test:

        * θ after the heap fills is at least ~the best single-term block
          bound, ``max_t idf_t·bmax_t``;
        * a TYPICAL range's upper bound is ``Σ_t idf_t·avg_bmax_t·cov_t``
          where ``cov_t = blocks_t / max_t blocks_t`` is the fraction of
          ranges term t actually overlaps — a rare term's few wide blocks
          bound only the ranges containing its postings, so its mass must
          not be charged to every range (that would mask exactly the
          rare-OR-hot regime pruning exists for).

        Two gates must both pass for 'wand': (1) the df-ratio breakeven —
        the dominant list must dwarf its companions (each companion posting
        is a Python-loop event; see the inline derivation), and (2) for OR,
        the bound test — a typical range's ub must sit well under the
        achievable θ so pruning actually bites. Uniform scores (avg ≈ max,
        cov ≈ 1) or fat companion lists → 'bucket'. Pure heuristic — both
        strategies are exact; only latency differs."""
        if self.tomb_ids.size or self.multi_segment:
            return "bucket"  # lazy WAND needs build-exact df/bounds
        le = self.local
        if not le._load_dictionary():
            return "bucket"
        uniq = sorted({t for t in terms if t.strip()})
        idfs, bmax, bavg, bn, dfs = [], [], [], [], []
        for t in uniq:
            i = int(np.searchsorted(le._dict_terms, t, side="left"))
            if i >= len(le._dict_terms) or le._dict_terms[i] != t:
                continue  # absent term contributes nothing to either bound
            df = int(le._dict_df[i])
            b = min(max(df, 0), self.N)
            idfs.append(float(np.log((self.N - b + 0.5) / (b + 0.5) + 1.0)))
            bmax.append(float(le._dict_bmax_max[i]))
            bavg.append(float(le._dict_bmax_avg[i]))
            bn.append(int(le._dict_bmax_n[i]))
            dfs.append(df)
        if len(idfs) < 2:
            return "bucket"  # single-term: the vectorized kernel wins
        # Breakeven between the kernels, measured on this runtime
        # (BENCH_SKEW.json protocol): every un-pruned event (a range the
        # kernel must stop at — roughly, each posting of the NON-dominant
        # terms) costs ~70 µs of document-at-a-time Python, while the
        # bucket kernel decodes+scores postings at ~0.1 µs each fully
        # vectorized. WAND therefore wins when the dominant list dwarfs the
        # companions by ≳3 orders of magnitude — the classic rare-AND/OR-
        # stopword query — and loses everywhere else no matter how well its
        # bounds prune. (A JVM/native engine's ~100 ns event cost moves
        # this ratio to ~10; the reference serves exactly that regime.)
        total_df, max_df = sum(dfs), max(dfs)
        companions = total_df - max_df
        if companions * 1000 > max_df:
            return "bucket"
        if conjunctive:
            return "wand"  # seek through the dominant list, decode ~nothing
        idfs_a = np.asarray(idfs)
        coverage = np.asarray(bn, dtype=np.float64) / max(bn)
        theta_est = float((idfs_a * np.asarray(bmax)).max())
        typical_ub = float((idfs_a * np.asarray(bavg) * coverage).sum())
        return "wand" if typical_ub < 0.5 * theta_est else "bucket"

    def search_topk(
        self, query: str, limit: int = 10, strategy: str = "auto"
    ) -> List[Tuple[int, float]]:
        """Distributed top-k.

        strategy='auto' consults :meth:`choose_topk_strategy`: the block-max
        WAND kernels when the per-block bound stats say pruning will bite
        (score skew — rare terms mixed with hot ones, tf spikes), else the
        bucket tier (vectorized decode+score per doc-range bucket — fastest
        when score variance is low and nothing can be pruned).
        strategy='wand' forces the block-max kernels: the range-bulk BMW
        variant for OR (block-bound pruning + vectorized scoring of unpruned
        ranges) and document-at-a-time intersection for AND.
        strategy='bucket' forces the bucket tier. All paths are exact and
        rank-identical; tests pin them to the exhaustive scorer."""
        limit = max(0, min(limit, MAX_SEARCH_LIMIT))
        result = querydsl.parse(query)
        or_terms = self.wand_terms(result.ast, "OR")
        and_terms = self.wand_terms(result.ast, "AND")
        terms = or_terms if or_terms is not None else and_terms
        conjunctive = or_terms is None
        if terms is not None:
            terms = [t for t in terms if t.strip()]
        wand_eligible = (
            terms is not None and bool(terms) and result.sort is None
            and not self.tomb_ids.size and not self.multi_segment
        )
        if strategy == "auto" and self.local.can_execute(result.ast, result.sort):
            # the local numpy tier is fastest whenever its byte budgets
            # admit the query — same routing search_result applies
            return self.local.execute(query, limit)[0]
        if (
            strategy == "auto"
            and wand_eligible
            and self.choose_topk_strategy(terms, conjunctive) == "wand"
        ):
            strategy = "wand"
        if strategy != "wand" or not wand_eligible:
            # bucket tier: vectorized, and exact under tombstones / delta
            # segments too (live-df map, tombstone filter). Lazy WAND needs
            # build-exact df/bounds, so those shapes always land here.
            if result.sort is None:
                served = self._serve_buckets(result.ast, limit)
                if served is not None:
                    return served[0]
            return self.search_result(query, limit)[0]
        multiplicity: dict = {}
        for t in terms:
            multiplicity[t] = multiplicity.get(t, 0) + 1
        n_distinct = len(multiplicity)
        rows = self.postings.filter(F.col("term").isin(sorted(multiplicity)))
        N, avgdl, k = self.N, self.avgdl, limit

        def bucket_wand(key, pdf: pd.DataFrame) -> pd.DataFrame:
            cursors = []
            for r in pdf.itertuples(index=False):
                dfg = int(r.df)
                bounded = min(max(dfg, 0), N)
                idf = float(np.log((N - bounded + 0.5) / (bounded + 0.5) + 1.0))
                for _ in range(multiplicity[r.term]):
                    cursors.append(
                        TermCursor(
                            bytes(r.payload),
                            r.block_last_doc,
                            r.block_offset,
                            r.block_max_raw,
                            int(r.df_shard),
                            idf,
                        )
                    )
            if conjunctive:
                # a term absent from this bucket ⇒ no conjunctive match here
                if pdf["term"].nunique() < n_distinct:
                    hits = []
                else:
                    hits = wand_topk_and(cursors, k, avgdl)
            else:
                # range-bulk block-max kernel: same pruning bound as classic
                # WAND, vectorized scoring over each unpruned range
                hits = wand_topk_bulk(cursors, k, avgdl)
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([h[0] for h in hits], dtype="int64"),
                    "score": pd.Series([h[1] for h in hits], dtype="float64"),
                }
            )

        top = self._memo_collect(
            ("wand", conjunctive, tuple(sorted(multiplicity.items())), k),
            lambda: rows.groupBy("bucket")
            .applyInPandas(bucket_wand, _TOPK_SCHEMA)
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k),
        )
        return [(r["doc_id"], r["score"]) for r in top]
