"""SolrCloud routing gates (cloud.py vs solrj CompositeIdRouter /
HashBasedRouter / DocRouter / Hash.murmurhash3_x86_32): published
murmur3 vectors, vectorized==scalar parity incl. multibyte UTF-8,
composite sliceHash bit layout, /bits mask overrides, partitionRange
shape, and the route()/search_slices() containment contract."""

import random

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.cloud import (
    INT32_MAX,
    INT32_MIN,
    murmur3_x86_32,
    murmur3_x86_32_np,
    partition_ranges,
    route,
    search_slices,
    shard_of,
    slice_hash,
    slice_hash_np,
)

# widely-published murmur3_x86_32 reference vectors (seed, input, hash)
VECTORS = [
    (0, "", 0x00000000),
    (1, "", 0x514E28B7),
    (0, "hello", 0x248BFA47),
    (0, "hello, world", 0x149BBB7F),
    (0, "19 Jan 2038 at 3:14:07 AM", 0xE31E8A70),
    (0, "The quick brown fox jumps over the lazy dog", 0x2E4FF723),
]


class TestMurmur3:
    def test_published_vectors_scalar(self):
        for seed, s, exp in VECTORS:
            assert murmur3_x86_32(s, seed) & 0xFFFFFFFF == exp, s

    def test_published_vectors_vectorized(self):
        seed0 = [(s, e) for seed, s, e in VECTORS if seed == 0]
        got = murmur3_x86_32_np(pd.Series([s for s, _ in seed0]))
        exp = [e for _, e in seed0]
        assert [int(h) & 0xFFFFFFFF for h in got] == exp

    def test_vectorized_equals_scalar_random(self):
        rng = random.Random(42)
        pool = ("abcdefghijklmnop0123456789!_-/ "
                "éü中文\U0001F600")
        strs = ["".join(rng.choice(pool)
                        for _ in range(rng.randrange(0, 40)))
                for _ in range(300)]
        got = murmur3_x86_32_np(pd.Series(strs))
        for s, h in zip(strs, got):
            assert int(h) == murmur3_x86_32(s), repr(s)

    def test_all_tail_lengths(self):
        for n in range(0, 9):
            s = "abcdefgh"[:n]
            assert int(murmur3_x86_32_np(pd.Series([s]))[0]) \
                == murmur3_x86_32(s)


class TestSliceHash:
    def test_composite_bit_layout(self):
        # 16 high bits from part1, 16 low bits from part2
        # (CompositeIdRouter.sliceHash:62-88)
        h = slice_hash("tenant!doc1") & 0xFFFFFFFF
        h1 = murmur3_x86_32("tenant") & 0xFFFFFFFF
        h2 = murmur3_x86_32("doc1") & 0xFFFFFFFF
        assert h == ((h1 & 0xFFFF0000) | (h2 & 0x0000FFFF))

    def test_no_separator_is_plain_hash(self):
        assert slice_hash("plainid") == murmur3_x86_32("plainid")

    def test_bits_override(self):
        # tenant/8!id -> 8 bits from part1 (setBits:45-48)
        h = slice_hash("t/8!x") & 0xFFFFFFFF
        h1 = murmur3_x86_32("t") & 0xFFFFFFFF
        h2 = murmur3_x86_32("x") & 0xFFFFFFFF
        assert h == ((h1 & 0xFF000000) | (h2 & 0x00FFFFFF))

    def test_bits_zero_and_32(self):
        hx = murmur3_x86_32("x") & 0xFFFFFFFF
        assert slice_hash("t/0!x") & 0xFFFFFFFF == hx
        ht = murmur3_x86_32("t") & 0xFFFFFFFF
        assert slice_hash("t/32!x") & 0xFFFFFFFF == ht

    def test_invalid_bits_spec_ignored(self):
        # getBits returns -1 on non-digits / >32: fall back to 16
        assert slice_hash("t/ab!x") == slice_hash("t/ab!x")
        h = slice_hash("t/99!x") & 0xFFFFFFFF
        h1 = murmur3_x86_32("t/99") & 0xFFFFFFFF
        h2 = murmur3_x86_32("x") & 0xFFFFFFFF
        assert h == ((h1 & 0xFFFF0000) | (h2 & 0x0000FFFF))

    def test_vectorized_matches_scalar(self):
        ids = ["a!1", "b!2", "plain", "t/8!x", "sh/0!y", "!empty",
               "trail!", "multi!ban!g"]
        got = slice_hash_np(pd.Series(ids))
        for s, h in zip(ids, got):
            assert int(h) == slice_hash(s), s


class TestRing:
    def test_partition_ranges_shape(self):
        for n in (1, 2, 3, 8, 7, 16):
            rs = partition_ranges(n)
            assert len(rs) == n
            assert rs[0][0] == INT32_MIN and rs[-1][1] == INT32_MAX
            for (a, b), (c, d) in zip(rs, rs[1:]):
                assert c == b + 1 and a <= b

    def test_shard_of_boundaries(self):
        rs = partition_ranges(4)
        for i, (lo, hi) in enumerate(rs):
            got = shard_of(np.array([lo, hi]), rs)
            assert list(got) == [i, i]

    def test_search_slices_plain_key_single(self):
        rs = partition_ranges(8)
        h = murmur3_x86_32("somekey")
        assert search_slices("somekey", 8) == \
            [int(shard_of(np.array([h]), rs)[0])]

    def test_search_slices_none_is_all(self):
        assert search_slices(None, 4) == [0, 1, 2, 3]

    def test_route_contained_in_search_slices(self):
        # every doc 'tenant!id' must land in a slice the _route_
        # param 'tenant!' maps to
        rng = random.Random(7)
        rs = partition_ranges(8)
        for t in ("web", "wiki", "cc", "été"):
            slices = set(search_slices(t + "!", 8))
            ids = pd.Series([f"{t}!{rng.randrange(10**6)}"
                             for _ in range(50)])
            got = shard_of(slice_hash_np(ids), rs)
            assert set(int(g) for g in got) <= slices

    def test_bits16_route_key_is_one_or_two_slices_of_8(self):
        # 16 mask bits over 8 slices: the tenant range spans 1/65536
        # of the ring -> at most 2 adjacent slices (boundary case)
        for t in ("a", "bb", "ccc", "dddd"):
            s = search_slices(t + "!", 8)
            assert 1 <= len(s) <= 2
            assert s == sorted(s)


class TestRouteDataFrame:
    def test_route_column_matches_scalar(self, spark):
        rows = [(f"t{i % 3}!{i}",) for i in range(40)]
        df = spark.createDataFrame(rows, "ckey string")
        got = {r["ckey"]: r["shard"]
               for r in route(df, "ckey", 8).collect()}
        rs = partition_ranges(8)
        for (k,) in rows:
            exp = int(shard_of(np.array([slice_hash(k)]), rs)[0])
            assert got[k] == exp, k

    def test_plan_is_arrow_not_row_python(self, spark):
        df = spark.createDataFrame([("a!1",)], "ckey string")
        plan = route(df, "ckey", 4)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan
