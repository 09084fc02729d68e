"""NumericUtils splitRange golden gates, ported from
lucene/core/src/test/org/apache/lucene/util/TestNumericUtils.java
(testSplitLongRange, testSplitIntRange, testLongExtremeValues) plus
the disjoint-cover property check the reference's bitset performs."""

import pytest

from lucene_solr_spark.functions.numerictrie import (
    split_int_range,
    split_long_range,
)

LONG_MAX = (1 << 63) - 1
LONG_MIN = -(1 << 63)
INT_MAX = (1 << 31) - 1
INT_MIN = -(1 << 31)


def _unsigned_view_long(triples):
    # the reference test displays bounds as (b ^ sign) >>> shift
    out = []
    for mn, mx, sh in triples:
        out.append(sh)
        out.append(((mn ^ (1 << 63)) & ((1 << 64) - 1)) >> sh)
        out.append(((mx ^ (1 << 63)) & ((1 << 64) - 1)) >> sh)
    return out


def _unsigned_view_int(triples):
    out = []
    for mn, mx, sh in triples:
        out.append(sh)
        out.append(((mn ^ (1 << 31)) & ((1 << 32) - 1)) >> sh)
        out.append(((mx ^ (1 << 31)) & ((1 << 32) - 1)) >> sh)
    return out


def _expect(bounds, shifts):
    out = []
    it = iter(bounds)
    for sh in shifts:
        out.append(sh)
        out.append(next(it))
        out.append(next(it))
    return out


def _assert_cover(triples, lower, upper):
    # ranges must tile [lower, upper] without overlap (the reference's
    # OpenBitSet check)
    ivs = sorted((mn, mx) for mn, mx, _sh in triples)
    assert ivs[0][0] == lower and ivs[-1][1] == upper
    for (a_mn, a_mx), (b_mn, b_mx) in zip(ivs, ivs[1:]):
        assert b_mn == a_mx + 1


def test_split_long_standard_range():
    got = split_long_range(4, -5000, 9500)
    assert _unsigned_view_long(got) == _expect([
        0x7fffffffffffec78, 0x7fffffffffffec7f,
        0x8000000000002510, 0x800000000000251c,
        0x7fffffffffffec8, 0x7fffffffffffecf,
        0x800000000000250, 0x800000000000250,
        0x7fffffffffffed, 0x7fffffffffffef,
        0x80000000000020, 0x80000000000024,
        0x7ffffffffffff, 0x8000000000001,
    ], [0, 0, 4, 4, 8, 8, 12])
    _assert_cover(got, -5000, 9500)


def test_split_long_no_split():
    got = split_long_range(64, -5000, 9500)
    assert _unsigned_view_long(got) == _expect(
        [0x7fffffffffffec78, 0x800000000000251c], [0])


def test_split_long_aligned_lower_bound():
    got = split_long_range(4, 0, 1024 + 63)
    assert _unsigned_view_long(got) == _expect([
        0x800000000000040, 0x800000000000043,
        0x80000000000000, 0x80000000000003,
    ], [4, 8])
    _assert_cover(got, 0, 1024 + 63)


@pytest.mark.parametrize("ps,bounds,shifts", [
    (8, [0x00, 0xff], [56]),
    (4, [0x0, 0xf], [60]),
    (2, [0x0, 0x3], [62]),
    (1, [0x0, 0x1], [63]),
])
def test_split_long_full_range(ps, bounds, shifts):
    got = split_long_range(ps, LONG_MIN, LONG_MAX)
    assert _unsigned_view_long(got) == _expect(bounds, shifts)


@pytest.mark.parametrize("ps", [1, 2, 4, 6, 8, 64])
def test_split_long_max_extreme(ps):
    got = split_long_range(ps, LONG_MAX, LONG_MAX)
    assert _unsigned_view_long(got) == _expect(
        [0xffffffffffffffff, 0xffffffffffffffff], [0])


def test_split_long_max_minus_0xf():
    got = split_long_range(4, LONG_MAX - 0xF, LONG_MAX)
    assert _unsigned_view_long(got) == _expect(
        [0xfffffffffffffff, 0xfffffffffffffff], [4])
    got = split_long_range(4, LONG_MAX - 0x10, LONG_MAX)
    assert _unsigned_view_long(got) == _expect([
        0xffffffffffffffef, 0xffffffffffffffef,
        0xfffffffffffffff, 0xfffffffffffffff,
    ], [0, 4])


@pytest.mark.parametrize("ps", [1, 2, 4, 6, 8, 64])
def test_split_long_min_extreme(ps):
    got = split_long_range(ps, LONG_MIN, LONG_MIN)
    assert _unsigned_view_long(got) == _expect([0x0, 0x0], [0])


def test_split_long_min_plus():
    got = split_long_range(4, LONG_MIN, LONG_MIN + 0xF)
    assert _unsigned_view_long(got) == _expect([0x0, 0x0], [4])


def test_split_int_standard_range():
    got = split_int_range(4, -5000, 9500)
    assert _unsigned_view_int(got) == _expect([
        0x7fffec78, 0x7fffec7f,
        0x80002510, 0x8000251c,
        0x7fffec8, 0x7fffecf,
        0x8000250, 0x8000250,
        0x7fffed, 0x7fffef,
        0x800020, 0x800024,
        0x7ffff, 0x80001,
    ], [0, 0, 4, 4, 8, 8, 12])
    _assert_cover(got, -5000, 9500)


def test_split_int_no_split_and_aligned():
    got = split_int_range(32, -5000, 9500)
    assert _unsigned_view_int(got) == _expect(
        [0x7fffec78, 0x8000251c], [0])
    got = split_int_range(4, 0, 1024 + 63)
    assert _unsigned_view_int(got) == _expect([
        0x8000040, 0x8000043,
        0x800000, 0x800003,
    ], [4, 8])


def test_empty_and_invalid():
    assert split_long_range(4, 10, 9) == []
    with pytest.raises(ValueError):
        split_long_range(0, 0, 1)


def test_cover_property_random_ranges():
    # reference: bitset tiling check over moderate ranges
    import random
    rnd = random.Random(42)
    for _ in range(50):
        lo = rnd.randint(-(1 << 40), 1 << 40)
        hi = lo + rnd.randint(0, 1 << 16)
        for ps in (1, 2, 4, 7, 11):
            _assert_cover(split_long_range(ps, lo, hi), lo, hi)
