"""Varbyte codec invariants (FIXTURES.md §E): decode(encode(x)) == x on
seeded random inputs, including xxhash64-range (negative) docIDs."""

from __future__ import annotations

import numpy as np

from geometric_aware_retrieval_v2_spark.functions.varbyte import (
    decode_postings_block,
    encode_postings_block,
    varbyte_decode,
    varbyte_encode,
)
from geometric_aware_retrieval_v2_spark.operators.postings import decode_block, _encode_block


def test_varbyte_roundtrip_small():
    rng = np.random.default_rng(42)
    for _ in range(20):
        vals = rng.integers(0, 2**40, size=rng.integers(0, 300)).astype(np.uint64)
        assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_varbyte_boundaries():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**63 - 1, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_postings_block_roundtrip_signed_ids():
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = int(rng.integers(1, 200))
        ids = np.sort(rng.integers(-(2**62), 2**62, size=n))
        ids = np.unique(ids)
        tfs = rng.integers(1, 50, size=len(ids)).astype(np.uint64)
        buf = encode_postings_block(ids, tfs)
        out_ids, out_tfs = decode_postings_block(buf, len(ids))
        assert np.array_equal(out_ids, ids)
        assert np.array_equal(out_tfs, tfs)


def test_three_stream_block_roundtrip():
    rng = np.random.default_rng(11)
    ids = np.unique(rng.integers(-(2**62), 2**62, size=150))
    tfs = rng.integers(1, 99, size=len(ids))
    dls = rng.integers(1, 700, size=len(ids))
    d, t, l = decode_block(_encode_block(ids, tfs, dls), len(ids))
    assert np.array_equal(d, ids)
    assert np.array_equal(t.astype(np.int64), tfs)
    assert np.array_equal(l.astype(np.int64), dls)
