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


def test_ranges_to_indices():
    from geometric_aware_retrieval_v2_spark.operators.postings import (
        _ranges_to_indices,
    )

    starts = np.array([5, 0, 10], dtype=np.int64)
    lens = np.array([3, 0, 2], dtype=np.int64)
    assert _ranges_to_indices(starts, lens).tolist() == [5, 6, 7, 10, 11]
    assert _ranges_to_indices(np.array([], dtype=np.int64),
                              np.array([], dtype=np.int64)).size == 0


def test_pack_arrays_matches_per_block_reference():
    """The Arrow kernel's one-buffer payload assembly must produce, block by
    block, exactly the bytes the single-block reference encoder produces."""
    from geometric_aware_retrieval_v2_spark.operators.postings import _pack_arrays

    rng = np.random.default_rng(3)
    n = 5000
    vocab = rng.integers(-(2**62), 2**62, 17)
    term_ids = vocab[rng.integers(0, len(vocab), n)]
    shards = rng.integers(0, 4, n).astype(np.int32)
    docs = rng.integers(-(2**62), 2**62, n)
    # unique (term, shard, doc) keys so the reference sort is unambiguous
    _, keep = np.unique(
        np.stack([term_ids, shards, docs]), axis=1, return_index=True
    )
    term_ids, shards, docs = term_ids[keep], shards[keep], docs[keep]
    m = len(term_ids)
    tfs = rng.integers(1, 40, m).astype(np.uint64)
    dls = rng.integers(1, 700, m).astype(np.uint64)

    rb = _pack_arrays(term_ids, shards, docs, tfs, dls, block_size=8)
    got = rb.to_pandas()

    order = np.lexsort((docs, shards, term_ids))
    ts, ss, ds, fs, ls = (term_ids[order], shards[order], docs[order],
                          tfs[order], dls[order])
    i = 0
    rows = []
    while i < len(ts):
        j = i
        while (j < len(ts) and ts[j] == ts[i] and ss[j] == ss[i]
               and j - i < 8):
            j += 1
        rows.append((ts[i], ss[i], _encode_block(ds[i:j], fs[i:j], ls[i:j])))
        i = j
    assert len(rows) == len(got)
    for (t_ref, s_ref, b_ref), (_, r) in zip(rows, got.iterrows()):
        assert r["term_id"] == t_ref and r["shard"] == s_ref
        assert bytes(r["bytes"]) == b_ref
