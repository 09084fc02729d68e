"""Gates for the RecursivePrefixTree geohash strategy
(search/geohash.py): public geohash vectors, scalar/vectorized encoder
agreement, bbox round-trip, and the cover soundness/exactness
properties the reference filter guarantees
(AbstractVisitingPrefixTreeFilter: no point inside the shape may be
missed; WITHIN prefixes must be exact subsets)."""

import math
import random

import numpy as np
import pytest

from lucene_solr_spark.search.geohash import (
    PlanarCircle,
    cell_size,
    circle_cover,
    decode_bbox,
    encode,
    encode_array,
    level_for_distance,
)


class TestEncode:
    # public vectors (Wikipedia geohash article examples)
    def test_known_vectors(self):
        assert encode(42.605, -5.603, 5) == "ezs42"
        assert encode(57.64911, 10.40744, 11) == "u4pruydqqvj"

    def test_array_matches_scalar(self):
        rng = random.Random(7)
        lat = np.array([rng.uniform(-90, 90) for _ in range(2000)])
        lon = np.array([rng.uniform(-180, 180) for _ in range(2000)])
        for prec in (1, 3, 6, 12):
            got = encode_array(lat, lon, prec)
            want = [encode(a, b, prec) for a, b in zip(lat, lon)]
            assert got == want

    def test_bbox_roundtrip(self):
        rng = random.Random(11)
        for _ in range(500):
            la, lo = rng.uniform(-90, 90), rng.uniform(-180, 180)
            gh = encode(la, lo, 6)
            lat_min, lat_max, lon_min, lon_max = decode_bbox(gh)
            assert lat_min <= la <= lat_max
            assert lon_min <= lo <= lon_max
            w, h = cell_size(6)
            assert lon_max - lon_min == pytest.approx(w)
            assert lat_max - lat_min == pytest.approx(h)

    def test_prefix_nesting(self):
        gh = encode(42.605, -5.603, 6)
        for k in range(1, 6):
            outer = decode_bbox(gh[:k])
            inner = decode_bbox(gh[:k + 1])
            assert outer[0] <= inner[0] and inner[1] <= outer[1]
            assert outer[2] <= inner[2] and inner[3] <= outer[3]


class TestLevelForDistance:
    def test_zero_short_circuits_to_max(self):
        assert level_for_distance(0, max_levels=9) == 9

    def test_monotone(self):
        lvls = [level_for_distance(d) for d in (90, 20, 5, 1, 0.1)]
        assert lvls == sorted(lvls)
        assert all(1 <= lv <= 12 for lv in lvls)


class TestCircleCover:
    @pytest.mark.parametrize("lat0,lon0,radius", [
        (10.0, 20.0, 25.0),
        (0.0, 0.0, 3.0),
        (60.0, -150.0, 12.0),
        (-45.0, 170.0, 7.0),   # near the dateline edge of the grid
    ])
    def test_sound_and_within_exact(self, lat0, lon0, radius):
        circ = PlanarCircle(lat0, lon0, radius,
                            math.cos(math.radians(lat0)))
        detail = min(level_for_distance(radius) + 1, 4)
        cover = circle_cover(circ, detail)
        rng = random.Random(42)
        for _ in range(5000):
            la, lo = rng.uniform(-90, 90), rng.uniform(-180, 180)
            d = circ._dist(la, lo)
            gh = encode(la, lo, detail)
            hit_in = any(gh.startswith(p) for p in cover["inside"])
            hit_bd = any(gh.startswith(p) for p in cover["boundary"])
            if d <= radius:
                # soundness: nothing inside the circle is missed
                assert hit_in or hit_bd
            if hit_in:
                # WITHIN prefixes are exact subsets: no refine needed
                assert d <= radius + 1e-9

    def test_mixed_prefix_lengths(self):
        circ = PlanarCircle(10.0, 20.0, 25.0,
                            math.cos(math.radians(10.0)))
        cover = circle_cover(circ, 3)
        lens = {len(p) for p in cover["inside"]}
        assert len(lens) > 1  # the recursive walk emits short prefixes
        assert all(len(p) == 3 for p in cover["boundary"])


class TestDecodeGhhsin:
    """GeohashUtils.decode cell centers + GeohashHaversineFunction."""

    def test_decode_public_vector(self):
        from lucene_solr_spark.search.geohash import decode

        # the canonical public geohash example
        assert decode("ezs42") == (42.60498046875, -5.60302734375)

    def test_roundtrip_within_cell(self):
        from lucene_solr_spark.search.geohash import (
            cell_size,
            decode,
            encode,
        )

        for lat, lon, p in [(48.8566, 2.3522, 7), (-33.86, 151.21, 6),
                            (0.0, 0.0, 5), (89.9, -179.9, 8)]:
            clat, clon = decode(encode(lat, lon, p))
            dlat, dlon = cell_size(p)
            assert abs(clat - lat) <= dlat / 2 + 1e-9
            assert abs(clon - lon) <= dlon / 2 + 1e-9

    def test_ghhsin(self):
        from lucene_solr_spark.search.geohash import (
            decode,
            ghhsin,
            haversine_km,
        )

        assert ghhsin("ezs42", "ezs42") == 0.0
        a, b = "u4pruydqqvj", "ezs42"
        la1, lo1 = decode(a)
        la2, lo2 = decode(b)
        assert ghhsin(a, b) == haversine_km(la1, lo1, la2, lo2)
        # symmetric; null hash -> Double.MAX_VALUE (:94-95)
        assert ghhsin(b, a) == ghhsin(a, b)
        assert ghhsin("", b) == 1.7976931348623157e308
