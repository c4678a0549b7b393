"""lse — a PySpark-native inverted-index + BM25 full-text engine.

A from-scratch reimplementation of the capabilities of the reference
`Xio-Shark/local-search-engine` (a single-node Java full-text engine),
re-expressed Spark-first: the index is a DataFrame, the build is a pair of
shuffles, the query DSL compiles to DataFrame plans, and top-k scoring is a
block-max WAND document-at-a-time kernel running in Arrow-vectorized numpy.

Layout:
    constants   — engine constants (BM25 k1/b, stopwords, limits), parity
                  with the reference's config/Constants.java
    tokenizer   — composite EN/CJK tokenizer (text/CompositeTokenizer.java
                  semantics), scalar core + Arrow-batched vectorized path
    codec       — delta + varbyte posting compression with 128-doc
                  block-max metadata (storage/{DeltaCodec,VarIntCodec}.java
                  semantics, numpy-vectorized)
    querydsl    — query DSL lexer/parser (query/{QueryLexer,QueryParser}.java
                  grammar) producing a Python AST
    bm25        — BM25 scoring, scalar + numpy (scoring/BM25Scorer.java)
    oracle      — pure-pandas reference-replica query engine
                  (query/QueryEngine.java semantics) used as the parity oracle
    ids         — deterministic distributed doc-id assignment
    build       — the 4-stage Spark index build (tokenize → tf-agg →
                  salted merge → compress/write) with lineage + resume
    engine      — AST → DataFrame plan compiler + WAND top-k query paths
    wand        — block-max WAND DAAT kernel (numpy)
    fixtures    — deterministic synthetic source-code corpus (seed=42)
"""

__version__ = "0.1.0"
