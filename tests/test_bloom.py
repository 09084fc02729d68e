"""Bloom sidecar gates (lucene/codecs/.../bloom/): MurmurHash2 pinned
by JVM-generated ground-truth vectors (the reference hash run on this
machine's JDK over the same bytes), FuzzySet no-false-negative and
downsize-membership properties, and an engine duel proving the
seekExact fail-fast (BloomFilteringPostingsFormat.java:334-345) never
changes results while eliminating the Spark probe for absent-only
batches."""

import base64

import numpy as np
import pytest

from lucene_solr_spark.indexing.bloom import (
    USABLE_SIZES,
    FuzzySet,
    build_bloom,
    estimated_unique_values,
    get_nearest_set_size,
    murmurhash2_32,
)

# (utf8 bytes base64, MurmurHash2.hash32) — generated with a JDK run of
# the reference algorithm (MurmurHash2.java:60-101, seed 0x9747b28c),
# covering the empty input, 1-3 byte signed-tail cases, 4-byte words,
# and multi-byte UTF-8 with high bytes (where Java's signed-byte tail
# mixing diverges from a naive unsigned port).
VECTORS = [
    ("", 275646681),
    ("YQ==", -1563381124),
    ("YWI=", 1391711463),
    ("YWJj", -1747815907),
    ("YWJjZA==", -1323649548),
    ("YWJjZGU=", 461995741),
    ("aGVsbG8=", 2132663229),
    ("bWVyZ2U=", -186939933),
    ("w6ljbGFpcg==", -1873953837),
    ("5Lit5paH6K+N", 774859528),
    ("enp6w78=", -749117773),
    ("dGhlIHF1aWNrIGJyb3duIGZveA==", 889336397),
    ("cQ==", -983537669),
    ("w7w=", -1891644291),
    ("ZGF0YeKAlHg=", 229931051),
]


class TestMurmurHash2:
    @pytest.mark.parametrize("b64,want", VECTORS)
    def test_jvm_vectors(self, b64, want):
        assert murmurhash2_32(base64.b64decode(b64)) == want

    def test_signed_tail_differs_from_unsigned(self):
        """0xFF in a TAIL position must sign-extend (Java byte); the
        same byte inside a 4-byte word must not change the word value.
        Guard against 'fixing' the port to a standard unsigned
        murmur2."""
        # zzzÿ: the ÿ (0xC3 0xBF) bytes land in the 2-byte tail
        assert murmurhash2_32("zzzÿ".encode()) == -749117773


class TestFuzzySet:
    def test_usable_sizes_all_ones(self):
        assert USABLE_SIZES[0] == 3
        for s in USABLE_SIZES:
            assert (s & (s + 1)) == 0  # 2^k - 1

    def test_sizing_estimate_matches_reference_formula(self):
        # FuzzySet.java:292-299 at 10% saturation
        assert estimated_unique_values(1023, 102) == int(
            1023 * -np.log(1 - 102 / 1023))
        size = get_nearest_set_size(1000, 0.10)
        assert size in USABLE_SIZES
        assert estimated_unique_values(size, int(size * 0.10)) > 1000

    def test_no_false_negatives(self):
        terms = [f"term_{i:05d}" for i in range(5000)]
        fs = FuzzySet.create(len(terms), 0.10)
        fs.add_terms(terms)
        assert all(fs.may_contain(t) for t in terms)

    def test_definite_no_exists(self):
        terms = [f"term_{i:05d}" for i in range(5000)]
        fs = FuzzySet.create(len(terms), 0.10)
        fs.add_terms(terms)
        probes = [f"absent_{i}" for i in range(2000)]
        nos = sum(not fs.may_contain(p) for p in probes)
        # ~10% saturation -> ~90% of absent probes answer NO
        assert nos > 1500

    def test_downsize_keeps_membership(self):
        terms = [f"t{i}" for i in range(200)]
        fs = FuzzySet.create(10 ** 6, 0.10)  # oversized on purpose
        fs.add_terms(terms)
        down = fs.downsize(0.10)
        assert down is not None and down.bloom_size < fs.bloom_size
        assert all(down.may_contain(t) for t in terms)

    def test_saturation_retirement(self):
        fs = FuzzySet(np.full(1, 0xFF, np.uint8), 3)  # 4 bits, all set
        assert fs.is_saturated()

    def test_save_load_roundtrip(self, tmp_path):
        terms = ["alpha", "beta", "gamma"]
        fs = FuzzySet.create(100, 0.10)
        fs.add_terms(terms)
        p = str(tmp_path / "b" / "x.fuzzy")
        fs.save(p)
        fs2 = FuzzySet.load(p)
        assert fs2.bloom_size == fs.bloom_size
        assert all(fs2.may_contain(t) for t in terms)
        assert np.array_equal(fs2.bits, fs.bits)


class TestEngineIntegration:
    def test_build_and_failfast_duel(self, spark, built):
        from lucene_solr_spark.search.executor import IndexSearcher

        index_dir, oracle = built
        plain = IndexSearcher(spark, index_dir)
        bloomed = IndexSearcher(spark, index_dir)
        fs = bloomed.enable_bloom()
        assert fs is not None
        # every index term answers MAYBE (no false negatives on the
        # real vocabulary)
        some_terms = [t for t, _ in oracle.postings.items()][:300]
        assert all(fs.may_contain(t) for t in some_terms)

        # result duel incl. absent terms in the query mix
        for q in ["common_util zzz_absent_zzz", "mergeidx",
                  "qqq_none_1 qqq_none_2"]:
            a = [(r["doc_id"], np.float32(r["score"]))
                 for r in plain.search(q, k=10).collect()]
            b = [(r["doc_id"], np.float32(r["score"]))
                 for r in bloomed.search(q, k=10).collect()]
            assert a == b

        # absent-only batch resolves driver-side: the df cache gets the
        # terms as definite misses without a scan
        before = dict(bloomed._df_cache)
        got = bloomed._lookup_dfs(["zz_only_absent_a", "zz_only_absent_b"])
        assert got == {}
        assert bloomed._df_cache["zz_only_absent_a"] is None
        assert set(before) <= set(bloomed._df_cache)

    def test_persisted_sidecar_reloads(self, spark, built):
        from lucene_solr_spark.search.executor import IndexSearcher

        index_dir, _ = built
        s1 = IndexSearcher(spark, index_dir)
        fs1 = s1.enable_bloom()
        s2 = IndexSearcher(spark, index_dir)
        fs2 = s2.enable_bloom()  # loads the saved file, no Spark job
        assert fs2.bloom_size == fs1.bloom_size
        assert np.array_equal(fs2.bits, fs1.bits)
