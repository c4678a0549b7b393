"""Training-data pipeline operators: dedup (exact/minhash/simhash/ngram),
similarity search (brute force + LSH), text analysis, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lse import dedup, multimodal, similarity, textops


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the spark engine "
        "builds inverted index structures for large scale search workloads"
    )
    rows = [
        (0, base),
        (1, base),                                        # exact dup of 0
        (2, base.replace("lazy", "sleepy")),              # near dup of 0
        (3, "completely different text about databases and storage layers"),
        (4, "completely different text about databases and storage engines"),
        (5, "short text"),
        (6, base + " with a tiny suffix appended here"),  # near dup of 0
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "content"]))


def test_exact_dups(corpus):
    rows = dedup.exact_dups(corpus).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 2 and rows[0]["doc_ids"] == [0, 1]


def test_dedup_exact_keeps_lowest_id(corpus):
    kept = {r["doc_id"] for r in dedup.dedup_exact(corpus).collect()}
    assert kept == {0, 2, 3, 4, 5, 6}


def test_ngram_jaccard_pairs(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
    assert (3, 4) in pairs
    assert (0, 3) not in pairs and (0, 5) not in pairs


def test_minhash_lsh_finds_near_dups(corpus):
    sigs = dedup.minhash_signatures(corpus, num_hashes=64)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_candidate_pairs(sigs, bands=16, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in pairs or (0, 6) in pairs  # near dups surface
    assert (0, 3) not in pairs


def test_minhash_signatures_deterministic(corpus):
    a = dedup.minhash_signatures(corpus, num_hashes=32).orderBy("doc_id").collect()
    b = dedup.minhash_signatures(corpus, num_hashes=32).orderBy("doc_id").collect()
    assert [r["sig"] for r in a] == [r["sig"] for r in b]


def test_simhash_near_dups(corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(corpus, max_hamming=10).collect()
    }
    assert pairs[(0, 1)] == 0  # identical text → identical simhash
    assert (0, 3) not in pairs


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    vecs[7] = vecs[0] + rng.standard_normal(16).astype(np.float32) * 0.01  # near dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_cosine_topk_exact(embeddings):
    df, vecs = embeddings
    got = similarity.cosine_topk(df, vecs[0], k=5).collect()
    # numpy reference
    v = vecs.astype(np.float64)
    cos = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    order = np.lexsort((np.arange(40), -cos))[:5]
    assert [r["vec_id"] for r in got] == [int(i) for i in order]
    for r, i in zip(got, order):
        assert r["cos"] == pytest.approx(cos[i], abs=1e-9)


def test_cosine_topk_lsh_contains_true_top1(embeddings):
    df, vecs = embeddings
    with_sig = similarity.hyperplane_signature(df, planes=6)
    got = similarity.cosine_topk_lsh(
        with_sig, vecs[0], k=3, planes=6, multiprobe=1
    ).collect()
    assert got, "LSH probe must not be empty"
    assert got[0]["vec_id"] == 0  # query vector itself lives in its bucket


def test_embedding_near_dups(embeddings):
    df, _ = embeddings
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.embedding_near_dups(df, 0.95).collect()}
    assert (0, 7) in pairs


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox is on the hill and it is very happy"),
            (1, "这是一个完全使用中文书写的文档，没有任何英文单词。"),
            (2, "zzz qqq xxx yyy www"),
        ],
        "doc_id long, content string",
    )
    got = {r["doc_id"]: r["lang_id"] for r in textops.add_language_id(df).collect()}
    assert got == {0: "en", 1: "cjk", 2: "unknown"}


def test_quality_score_orders_sensibly(spark):
    df = spark.createDataFrame(
        [
            (0, "This is a reasonably long and clean sentence about search "
                "engines and the way they rank documents for a given query."),
            (1, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        ],
        "doc_id long, content string",
    )
    got = {r["doc_id"]: r["quality"] for r in textops.add_quality(df).collect()}
    assert got[0] > got[1]


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "hello world, it's 42 degrees")], "doc_id long, content string")
    r = textops.add_token_counts(df).first()
    assert r["whitespace_tokens"] == 5
    assert r["bpe_tokens_est"] >= 6  # contraction + punct split


def test_fingerprints_detect_shared_content(spark, corpus):
    fps = {r["doc_id"]: set(r["fingerprints"]) for r in textops.fingerprints(corpus).collect()}
    assert fps[0] == fps[1]
    overlap_near = len(fps[0] & fps[2]) / len(fps[0] | fps[2])
    overlap_far = len(fps[0] & fps[3]) / len(fps[0] | fps[3])
    assert overlap_near > 0.5 > overlap_far


def test_multimodal_image_features(spark):
    imgs = multimodal.make_fake_image_table(spark, n=10)
    feats = multimodal.image_features(imgs, backend="fake").collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["feature"]) == 16
        assert r["width"] > 0 and r["height"] > 0
    # deterministic across runs
    again = multimodal.image_features(imgs, backend="fake").collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_multimodal_real_backend_rejects_non_png(spark):
    """backend='real' now DECODES PNG (lse.png); non-PNG payloads must fail
    loudly (quarantine, never fabricated pixels). The fake table's payloads
    are random bytes — not PNGs."""
    imgs = multimodal.make_fake_image_table(spark, n=2)
    with pytest.raises(Exception, match="png: bad signature|ValueError"):
        multimodal.image_features(imgs, backend="real").collect()


def test_multimodal_resize_and_framesample(spark):
    imgs = multimodal.make_fake_image_table(spark, n=5)
    rs = multimodal.image_resize_meta(imgs, max_side=16).collect()
    assert all(max(r["new_width"], r["new_height"]) <= 16 for r in rs)
    vids = imgs  # same (id, payload) shape
    frames = multimodal.video_frame_sample(vids, every_n=50).collect()
    assert frames and all(r["frame_idx"] % 50 == 0 for r in frames)