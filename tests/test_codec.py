"""Codec round-trip properties, seeded-random style after the
reference's BasePostingsFormatTestCase (test-framework/.../index/
BasePostingsFormatTestCase.java:112-200): random posting lists of many
shapes must survive encode->decode bit-exactly, including partial
(skip-masked) decode."""

import numpy as np
import pytest

from lucene_solr_spark.constants import BLOCK_SIZE
from lucene_solr_spark.indexing.codec import (
    decode_postings,
    decode_skips,
    encode_postings,
)


def _random_postings(rng, n, doc_space):
    docs = np.sort(rng.choice(doc_space, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int32)
    nbs = rng.integers(0, 256, size=n).astype(np.uint8)
    return docs, tfs, nbs


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 255, 256, 1000, 5000])
def test_roundtrip_sizes(n):
    rng = np.random.Generator(np.random.PCG64(n))
    docs, tfs, nbs = _random_postings(rng, n, n * 37 + 10)
    d, t, s = encode_postings(docs, tfs, nbs)
    got_docs, got_tfs = decode_postings(d, t, s)
    assert (got_docs == docs).all()
    assert (got_tfs == tfs).all()


def test_all_equal_tf_block_is_compact():
    docs = np.arange(0, 128, dtype=np.int64) * 3
    tfs = np.ones(128, dtype=np.int32)
    nbs = np.full(128, 120, dtype=np.uint8)
    d, t, s = encode_postings(docs, tfs, nbs)
    assert len(t) == 9  # 0xFF marker + 8-byte value
    # docs: deltas all 3 except first (1) -> NOT all-equal, width 2
    assert d[0] == 2
    got_docs, got_tfs = decode_postings(d, t, s)
    assert (got_docs == docs).all() and (got_tfs == 1).all()


def test_skip_metadata():
    rng = np.random.Generator(np.random.PCG64(7))
    docs, tfs, nbs = _random_postings(rng, 300, 10_000)
    _, _, s = encode_postings(docs, tfs, nbs)
    skips = decode_skips(s)
    assert len(skips) == 3
    assert skips["count"].tolist() == [128, 128, 44]
    assert skips["last_doc"][-1] == docs[-1]
    assert skips["last_doc"][0] == docs[127]
    assert skips["max_tf"][0] == tfs[:128].max()
    assert skips["max_nb"][1] == nbs[128:256].max()


def test_partial_decode_with_block_mask():
    rng = np.random.Generator(np.random.PCG64(11))
    docs, tfs, nbs = _random_postings(rng, 1000, 50_000)
    d, t, s = encode_postings(docs, tfs, nbs)
    nblocks = len(decode_skips(s))
    mask = np.zeros(nblocks, dtype=bool)
    mask[1] = mask[3] = mask[nblocks - 1] = True
    got_docs, got_tfs = decode_postings(d, t, s, block_mask=mask)
    lo, hi = BLOCK_SIZE, 2 * BLOCK_SIZE
    expect = np.concatenate(
        [docs[lo:hi], docs[3 * BLOCK_SIZE : 4 * BLOCK_SIZE], docs[(nblocks - 1) * BLOCK_SIZE :]]
    )
    assert (got_docs == expect).all()
    expect_tf = np.concatenate(
        [tfs[lo:hi], tfs[3 * BLOCK_SIZE : 4 * BLOCK_SIZE], tfs[(nblocks - 1) * BLOCK_SIZE :]]
    )
    assert (got_tfs == expect_tf).all()


def test_wide_deltas():
    # 64-bit doc space (10^12-file scale docIDs must round-trip)
    docs = np.array([0, 10**12, 2 * 10**12, 2 * 10**12 + 1], dtype=np.int64)
    tfs = np.array([1, 2, 3, 4], dtype=np.int32)
    nbs = np.array([1, 2, 3, 4], dtype=np.uint8)
    d, t, s = encode_postings(docs, tfs, nbs)
    got_docs, got_tfs = decode_postings(d, t, s)
    assert got_docs.tolist() == docs.tolist()
    assert got_tfs.tolist() == tfs.tolist()
