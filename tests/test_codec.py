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


def test_concat_postings_equals_full_encode():
    """The merge primitive: byte-concat of self-contained parts decodes
    identically to the parts decoded separately (no re-encode needed)."""
    from lucene_solr_spark.indexing.codec import concat_postings

    rng = np.random.Generator(np.random.PCG64(7))
    all_docs, all_tfs, parts = [], [], []
    base = 0
    for n in (1, 300, 128, 77):
        docs, tfs, nbs = _random_postings(rng, n, 10_000)
        docs = docs + base
        base = int(docs[-1]) + 1 + int(rng.integers(1, 1000))
        parts.append(encode_postings(docs, tfs, nbs))
        all_docs.append(docs)
        all_tfs.append(tfs)
    d, t, s = concat_postings(parts)
    got_docs, got_tfs = decode_postings(d, t, s)
    assert got_docs.tolist() == np.concatenate(all_docs).tolist()
    assert got_tfs.tolist() == np.concatenate(all_tfs).tolist()
    # skip metadata survives: ascending last_doc, masked decode works
    sk = decode_skips(s)
    assert (np.diff(sk["last_doc"]) > 0).all()
    mask = np.zeros(len(sk), dtype=bool)
    mask[0] = mask[len(sk) - 1] = True
    md, mt = decode_postings(d, t, s, block_mask=mask)
    assert md[0] == got_docs[0] and md[-1] == got_docs[-1]


def test_decode_prox_parts_multi():
    from lucene_solr_spark.indexing.codec import decode_prox_parts, encode_prox

    rng = np.random.Generator(np.random.PCG64(9))
    parts, all_deltas, cnts = [], [], []
    for n in (5, 300, 128):
        deltas = rng.integers(0, 50, n).astype(np.uint64)
        parts.append(encode_prox(deltas))
        all_deltas.append(deltas)
        cnts.append(n)
    buf = b"".join(parts)
    got = decode_prox_parts(buf, np.array(cnts, "<i8"), sum(cnts))
    assert got.tolist() == np.concatenate(all_deltas).tolist()
    one = decode_prox_parts(parts[1], None, 300)
    assert one.tolist() == all_deltas[1].tolist()


class TestVIntTailCodec:
    """'vint_tail' codec family (the Lucene41 VInt tail,
    Lucene41PostingsFormat.java:221-237, as an opt-in family): blocks
    are self-describing, so one decode path serves both families and
    merges stay concat-only."""

    @pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 255, 256, 1000])
    def test_roundtrip(self, n):
        rng = np.random.Generator(np.random.PCG64(n + 77))
        docs, tfs, nbs = _random_postings(rng, n, n * 37 + 10)
        d, t, s = encode_postings(docs, tfs, nbs, codec="vint_tail")
        got_docs, got_tfs = decode_postings(d, t, s)
        assert (got_docs == docs).all() and (got_tfs == tfs).all()

    def test_tail_block_is_vint_marked(self):
        from lucene_solr_spark.indexing.codec import VINT_BLOCK

        rng = np.random.Generator(np.random.PCG64(3))
        docs, tfs, nbs = _random_postings(rng, BLOCK_SIZE + 5, 10_000)
        d, t, s = encode_postings(docs, tfs, nbs, codec="vint_tail")
        skips = decode_skips(s)
        assert len(skips) == 2
        # first (full) block FOR-packed, tail block VInt-marked
        assert d[0] != VINT_BLOCK
        assert d[int(skips[1]["doc_off"])] == VINT_BLOCK
        assert t[int(skips[1]["tf_off"])] == VINT_BLOCK

    def test_mixed_family_concat(self):
        from lucene_solr_spark.indexing.codec import concat_postings

        rng = np.random.Generator(np.random.PCG64(9))
        docs, tfs, nbs = _random_postings(rng, 300, 100_000)
        half = 150
        p1 = encode_postings(docs[:half], tfs[:half], nbs[:half],
                             codec="for128")
        p2 = encode_postings(docs[half:], tfs[half:], nbs[half:],
                             codec="vint_tail")
        d, t, s = concat_postings([p1, p2])
        got_docs, got_tfs = decode_postings(d, t, s)
        assert (got_docs == docs).all() and (got_tfs == tfs).all()

    def test_unknown_codec_rejected(self):
        with pytest.raises(ValueError):
            encode_postings(np.array([1], np.int64),
                            np.array([1], np.int32),
                            np.array([0], np.uint8), codec="nope")
