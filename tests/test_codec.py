"""Property tests: the posting codec is an exact inverse, blocks independent."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from words_in_context_spark.operators.codec import (
    bm25_impact,
    decode_block,
    decode_postings,
    encode_postings,
    merge_encoded_runs,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=100, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_varbyte_known():
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert list(varbyte_decode(b"\xac\x02\x7f")) == [300, 127]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),
            st.integers(min_value=1, max_value=1000),
            st.integers(min_value=1, max_value=5000),
        ),
        min_size=1,
        max_size=700,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(postings):
    postings.sort()
    ids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    enc = encode_postings(ids, tfs, dls, avgdl=100.0, block=64)
    did, dtf, ddl = decode_postings(enc)
    assert np.array_equal(did, ids)
    assert np.array_equal(dtf, tfs)
    assert np.array_equal(ddl, dls)
    assert enc.df == len(ids)
    assert enc.cf == tfs.sum()
    # block metadata is consistent and max_impact is a true upper bound
    impacts = bm25_impact(tfs, dls, 100.0)
    pos = 0
    for bi in range(enc.first_doc.size):
        bids, btfs, _ = decode_block(enc, bi)
        cnt = int(enc.n[bi])
        assert np.array_equal(bids, ids[pos:pos + cnt])
        assert np.array_equal(btfs, tfs[pos:pos + cnt])
        assert enc.first_doc[bi] == ids[pos]
        assert enc.last_doc[bi] == ids[pos + cnt - 1]
        assert enc.max_impact[bi] >= impacts[pos:pos + cnt].max() - 1e-6
        pos += cnt


def test_merge_runs_equals_direct_encode():
    rng = np.random.default_rng(7)
    all_ids = np.sort(rng.choice(10**9, size=1000, replace=False))
    tfs = rng.integers(1, 50, size=1000)
    dls = rng.integers(10, 500, size=1000)
    # split into 4 disjoint salted runs by doc_id hash
    salt = all_ids % 4
    runs = [
        (all_ids[salt == s], tfs[salt == s], dls[salt == s]) for s in range(4)
    ]
    merged = merge_encoded_runs(runs, avgdl=120.0)
    direct = encode_postings(all_ids, tfs, dls, avgdl=120.0)
    assert merged.doc_bytes == direct.doc_bytes
    assert merged.tf_bytes == direct.tf_bytes
    assert merged.dl_bytes == direct.dl_bytes
    assert np.array_equal(merged.max_impact, direct.max_impact)


def test_compression_beats_raw():
    # dense doc ids → deltas are tiny → ~1 byte per posting per stream
    ids = np.arange(0, 100_000, 3, dtype=np.int64)
    tfs = np.ones(ids.size, dtype=np.int64)
    dls = np.full(ids.size, 100, dtype=np.int64)
    enc = encode_postings(ids, tfs, dls, avgdl=100.0)
    raw = ids.size * 16  # int64 doc + int64 tf
    assert len(enc.doc_bytes) + len(enc.tf_bytes) < raw / 7


def test_postings_roundtrip_negative_ids():
    # xxhash64 doc ids span the full signed int64 range
    rng = np.random.default_rng(3)
    ids = np.sort(rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64))
    ids = np.unique(ids)
    tfs = rng.integers(1, 9, size=ids.size)
    dls = rng.integers(5, 400, size=ids.size)
    enc = encode_postings(ids, tfs, dls, avgdl=90.0)
    did, dtf, ddl = decode_postings(enc)
    assert np.array_equal(did, ids)
    assert np.array_equal(dtf, tfs)
    assert np.array_equal(ddl, dls)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.integers(min_value=1, max_value=500),
            st.integers(min_value=1, max_value=2000),
        ),
        min_size=1,
        max_size=900,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=40, deadline=None)
def test_fast_decode_equals_blockwise(postings):
    from words_in_context_spark.operators.codec import decode_postings_fast

    postings.sort()
    ids = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    enc = encode_postings(ids, tfs, dls, avgdl=90.0, block=37)
    a = decode_postings(enc)
    b = decode_postings_fast(enc)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
