"""Codec tests — vectors mirroring the reference's CodecTest.java:26-241 and
StorageRoundTripTest.java:67-110 (varint boundaries, exact encoded sizes,
delta round-trips, non-monotone rejection, seeded-random postings, 128-doc
block boundaries)."""

import numpy as np
import pytest

from lse.codec import (
    decode_block,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    raw_bm25_component,
    varbyte_decode,
    varbyte_encode,
)


# CodecTest.java:26-40, :91-108 — boundary values and exact byte lengths
VARINT_SIZES = [(0, 1), (1, 1), (127, 1), (128, 2), (16383, 2), (16384, 3), (2**31 - 1, 5)]


@pytest.mark.parametrize("value,nbytes", VARINT_SIZES)
def test_varint_boundary_sizes(value, nbytes):
    buf = varbyte_encode(np.array([value]))
    assert len(buf) == nbytes
    decoded, end = varbyte_decode(buf)
    assert decoded.tolist() == [value]
    assert end == nbytes


def test_varint_roundtrip_sequence():
    vals = np.array([v for v, _ in VARINT_SIZES] + [300, 1_000_000, 2**40])
    buf = varbyte_encode(vals)
    decoded, end = varbyte_decode(buf)
    assert decoded.tolist() == vals.tolist()
    assert end == len(buf)


def test_varint_negative_rejected():
    with pytest.raises(ValueError):
        varbyte_encode(np.array([-1]))


def test_varint_seeded_random_roundtrip():
    # CodecTest.java:222-241 — randomized sequences up to 10K values
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**31 - 1, size=10_000)
    decoded, _ = varbyte_decode(varbyte_encode(vals))
    np.testing.assert_array_equal(decoded, vals)


def test_varint_partial_decode_with_count():
    vals = np.array([5, 300, 7, 99999])
    buf = varbyte_encode(vals)
    first_two, off = varbyte_decode(buf, 0, 2)
    assert first_two.tolist() == [5, 300]
    rest, end = varbyte_decode(buf, off, 2)
    assert rest.tolist() == [7, 99999]
    assert end == len(buf)


def test_delta_golden():
    # CodecTest.java:131-142 — [10,15,20,25,30] → [10,5,5,5,5]
    assert delta_encode(np.array([10, 15, 20, 25, 30])).tolist() == [10, 5, 5, 5, 5]
    assert delta_decode(np.array([10, 5, 5, 5, 5])).tolist() == [10, 15, 20, 25, 30]


def test_delta_non_monotone_rejected():
    # CodecTest.java:144-151
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 5]))
    with pytest.raises(ValueError):
        delta_encode(np.array([5, 3]))


def test_delta_with_base():
    ids = np.array([100, 150, 151])
    d = delta_encode(ids, first_base=90)
    assert d.tolist() == [10, 50, 1]
    assert delta_decode(d, first_base=90).tolist() == ids.tolist()


def _random_postings(n, seed=7):
    rng = np.random.default_rng(seed)
    gaps = rng.integers(1, 5, size=n)  # StorageRoundTripTest.java:67-110 shape
    doc_ids = np.cumsum(gaps)
    tfs = rng.integers(1, 20, size=n)
    dls = rng.integers(5, 400, size=n)
    return doc_ids, tfs, dls


def test_postings_roundtrip_350():
    # 350 docs → 3 blocks at interval 128 (StorageRoundTripTest.java:92-110)
    doc_ids, tfs, dls = _random_postings(350)
    enc = encode_postings(doc_ids, tfs, dls, avgdl=100.0)
    assert enc.df == 350
    assert len(enc.block_last_doc) == 3
    assert enc.block_last_doc.tolist() == [doc_ids[127], doc_ids[255], doc_ids[349]]
    ids, tf2, dl2 = decode_postings(enc.payload, enc.df)
    np.testing.assert_array_equal(ids, doc_ids)
    np.testing.assert_array_equal(tf2, tfs)
    np.testing.assert_array_equal(dl2, dls)


def test_postings_block_max_exact():
    doc_ids, tfs, dls = _random_postings(300, seed=3)
    avgdl = 123.4
    enc = encode_postings(doc_ids, tfs, dls, avgdl=avgdl)
    raw = raw_bm25_component(tfs, dls, avgdl)
    np.testing.assert_allclose(
        enc.block_max_raw,
        [raw[:128].max(), raw[128:256].max(), raw[256:].max()],
    )


def test_single_block_decode_matches_full():
    doc_ids, tfs, dls = _random_postings(350, seed=11)
    enc = encode_postings(doc_ids, tfs, dls, avgdl=50.0)
    prev_last = int(enc.block_last_doc[0])
    ids, tf2, dl2 = decode_block(enc.payload, int(enc.block_offset[1]), 128, prev_last)
    np.testing.assert_array_equal(ids, doc_ids[128:256])
    np.testing.assert_array_equal(tf2, tfs[128:256])
    np.testing.assert_array_equal(dl2, dls[128:256])


def test_empty_postings():
    enc = encode_postings(np.array([]), np.array([]), np.array([]), avgdl=1.0)
    assert enc.df == 0 and enc.payload == b""
    ids, tfs, dls = decode_postings(enc.payload, 0)
    assert ids.size == 0


def test_positions_blob_roundtrip():
    from lse.codec import decode_positions_blob, encode_positions

    rng = np.random.default_rng(5)
    doc_ids = np.cumsum(rng.integers(1, 9, size=40))
    plists = [
        np.sort(rng.choice(500, size=int(rng.integers(1, 12)), replace=False))
        for _ in range(40)
    ]
    payload = encode_positions(doc_ids, plists)
    ids2, plists2 = decode_positions_blob(payload, 40)
    np.testing.assert_array_equal(ids2, doc_ids)
    for a, b in zip(plists, plists2):
        np.testing.assert_array_equal(np.asarray(a), b)


def test_positions_blob_empty():
    from lse.codec import decode_positions_blob, encode_positions

    assert encode_positions(np.empty(0, dtype=np.int64), []) == b""
    ids, plists = decode_positions_blob(b"", 0)
    assert ids.size == 0 and plists == []
