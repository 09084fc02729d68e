"""RecursivePrefixTreeStrategy over a GeohashPrefixTree re-expression
(lucene/spatial/src/java/org/apache/lucene/spatial/prefix/
RecursivePrefixTreeStrategy.java, prefix/tree/GeohashPrefixTree.java,
AbstractVisitingPrefixTreeFilter.java).

Reference model: each point doc indexes its geohash cell token at every
level 1..maxLevels (PrefixTreeStrategy.createIndexableFields); an
Intersects filter walks the tree top-down — a cell fully inside the
query shape matches ALL docs under that prefix (no descent), a
partially-covered cell recurses until detailLevel, where leaf cells are
accepted (grid approximation).

Spark shape: the walk runs DRIVER-side on the query shape only (a few
dozen cells — it never touches data) and emits a mixed-length prefix
cover. The data side is one scan filter: per emitted prefix length L,
``substr(geohash, 1, L) IN (cells_L)`` — equality predicates on a
derived column, pushdown/partition-prune friendly (at 100 TB the corpus
would be written partitioned or z-ordered by a geohash prefix, so the
cover IN-list prunes files before any row is read). Docs under
fully-inside prefixes skip the exact distance test (the reference's
no-descent case); boundary-cell docs get the exact refine. Here the
refine is the engine's documented planar metric
sqrt(dlat^2 + (dlon*cos(lat0))^2) in degrees (see q_geodist_top10),
applied to boundary candidates only.

Pure relational alternative at query time: none needed — no UDF in the
data path when the geohash column is precomputed at ingest (the
vectorized encoder below is the ingest-side kernel).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_B32_INDEX = {c: i for i, c in enumerate(BASE32)}
MAX_PRECISION = 12  # GeohashUtils.MAX_PRECISION (24 for lat+lon pairs)


def _bits(level: int) -> Tuple[int, int]:
    """(lon_bits, lat_bits) at a geohash length: bits interleave
    starting with longitude, so lon gets the extra odd bit."""
    total = 5 * level
    return (total + 1) // 2, total // 2


def cell_size(level: int) -> Tuple[float, float]:
    """(width_deg, height_deg) of a level-N geohash cell."""
    lon_b, lat_b = _bits(level)
    return 360.0 / (1 << lon_b), 180.0 / (1 << lat_b)


def level_for_distance(dist_deg: float, max_levels: int = MAX_PRECISION,
                       ) -> int:
    """GeohashPrefixTree.getLevelForDistance: the shortest hash length
    whose cell width AND height are <= dist (GeohashUtils.
    lookupHashLenForWidthHeight), clamped to [1, max_levels]."""
    if dist_deg == 0:
        return max_levels
    for lvl in range(1, MAX_PRECISION + 1):
        w, h = cell_size(lvl)
        if w < dist_deg and h < dist_deg:
            return max(1, min(lvl, max_levels))
    return max_levels


def encode(lat: float, lon: float, precision: int = MAX_PRECISION) -> str:
    """Standard geohash (base-32, lon bit first)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(BASE32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def encode_array(lat: np.ndarray, lon: np.ndarray,
                 precision: int = 7) -> List[str]:
    """Vectorized encoder (the ingest-side kernel): quantize each axis
    to its bit budget, interleave bits numpy-side, then render base32.
    precision <= 12 keeps the interleaved value inside int64."""
    lon_b, lat_b = _bits(precision)
    lat_q = np.minimum(
        ((lat.astype(np.float64) + 90.0) / 180.0
         * (1 << lat_b)).astype(np.int64), (1 << lat_b) - 1)
    lon_q = np.minimum(
        ((lon.astype(np.float64) + 180.0) / 360.0
         * (1 << lon_b)).astype(np.int64), (1 << lon_b) - 1)
    total = 5 * precision
    inter = np.zeros(len(lat), dtype=np.int64)
    # bit k of the hash (MSB first, k=0 = first lon bit)
    for k in range(total):
        if k % 2 == 0:  # lon bit
            src, nbits, idx = lon_q, lon_b, k // 2
        else:
            src, nbits, idx = lat_q, lat_b, k // 2
        bit = (src >> (nbits - 1 - idx)) & 1
        inter = (inter << 1) | bit
    # render base32, 5 bits per char
    out = np.full(len(lat), "", dtype=object)
    chars = np.array(list(BASE32), dtype=object)
    for c in range(precision):
        shift = 5 * (precision - 1 - c)
        digit = (inter >> shift) & 31
        out = out + chars[digit.astype(np.intp)]
    return list(out)


def decode_bbox(gh: str) -> Tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of a geohash cell."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        d = _B32_INDEX[c]
        for shift in range(4, -1, -1):
            bit = (d >> shift) & 1
            if even:
                mid = (lon_lo + lon_hi) / 2
                if bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi


# -- query-shape cover (the driver-side tree walk) ---------------------------

class PlanarCircle:
    """The engine's documented planar metric (degrees):
    sqrt(dlat^2 + (dlon*coslat0)^2) <= radius."""

    def __init__(self, lat0: float, lon0: float, radius: float,
                 coslat0: float):
        self.lat0, self.lon0 = lat0, lon0
        self.radius, self.coslat0 = radius, coslat0

    def _dist(self, lat: float, lon: float) -> float:
        dlat = lat - self.lat0
        dlon = (lon - self.lon0) * self.coslat0
        return math.sqrt(dlat * dlat + dlon * dlon)

    def relate_bbox(self, lat_min, lat_max, lon_min, lon_max) -> str:
        """'WITHIN' (cell fully inside circle), 'INTERSECTS', or
        'DISJOINT' — rectangle-vs-circle under the planar metric."""
        # nearest rect point to center
        nlat = min(max(self.lat0, lat_min), lat_max)
        nlon = min(max(self.lon0, lon_min), lon_max)
        if self._dist(nlat, nlon) > self.radius:
            return "DISJOINT"
        # farthest corner
        far = max(self._dist(la, lo)
                  for la in (lat_min, lat_max)
                  for lo in (lon_min, lon_max))
        return "WITHIN" if far <= self.radius else "INTERSECTS"


def _children(prefix: str) -> List[str]:
    return [prefix + c for c in BASE32]


def circle_cover(circle: PlanarCircle, detail_level: int,
                 ) -> Dict[str, List[str]]:
    """RecursivePrefixTreeStrategy walk: returns
    {'inside': [prefixes fully within the circle — no refine needed],
     'boundary': [detail-level cells partially covered — exact refine]}.
    The walk is O(cells touched), independent of data size."""
    inside: List[str] = []
    boundary: List[str] = []

    def visit(prefix: str) -> None:
        rel = circle.relate_bbox(*decode_bbox(prefix))
        if rel == "DISJOINT":
            return
        if rel == "WITHIN":
            inside.append(prefix)
            return
        if len(prefix) >= detail_level:
            boundary.append(prefix)  # grid-approximation leaf
            return
        for child in _children(prefix):
            visit(child)

    for top in _children(""):
        visit(top)
    return {"inside": inside, "boundary": boundary}


def prefix_filter_condition(gh_col, cover: Dict[str, List[str]],
                            exact_refine):
    """Build the Catalyst condition: docs under an 'inside' prefix
    match outright; docs under a 'boundary' leaf must pass the exact
    predicate. Prefixes grouped by length -> a handful of
    substr-IN-list predicates, all scan-stage."""
    from pyspark.sql import functions as F

    def isin_by_len(prefixes: Sequence[str]):
        cond = None
        by_len: Dict[int, List[str]] = {}
        for p in prefixes:
            by_len.setdefault(len(p), []).append(p)
        for ln, cells in sorted(by_len.items()):
            c = F.substring(gh_col, 1, ln).isin(cells)
            cond = c if cond is None else (cond | c)
        return cond

    cond_in = isin_by_len(cover["inside"])
    cond_bd = isin_by_len(cover["boundary"])
    if cond_bd is not None:
        cond_bd = cond_bd & exact_refine
    if cond_in is None:
        return cond_bd if cond_bd is not None else F.lit(False)
    if cond_bd is None:
        return cond_in
    return cond_in | cond_bd


def decode(gh: str) -> Tuple[float, float]:
    """GeohashUtils.decode (spatial4j): the CELL CENTER of a geohash —
    the midpoint of its bbox (the encoder's inverse up to cell
    size)."""
    lat_min, lat_max, lon_min, lon_max = decode_bbox(gh)
    return (lat_min + lat_max) / 2.0, (lon_min + lon_max) / 2.0


EARTH_MEAN_RADIUS_KM = 6371.0087714   # spatial4j DistanceUtils


def haversine_km(lat1: float, lon1: float, lat2: float, lon2: float,
                 radius: float = EARTH_MEAN_RADIUS_KM) -> float:
    """Haversine great-circle distance (HaversineConstFunction.java:
    209-221 hsin chain)."""
    import math

    la1, lo1 = math.radians(lat1), math.radians(lon1)
    la2, lo2 = math.radians(lat2), math.radians(lon2)
    hx = math.sin((la1 - la2) * 0.5)
    hy = math.sin((lo1 - lo2) * 0.5)
    h = hx * hx + math.cos(la1) * math.cos(la2) * hy * hy
    return 2.0 * radius * math.atan2(math.sqrt(h), math.sqrt(1.0 - h))


def ghhsin(gh1: str, gh2: str,
           radius: float = EARTH_MEAN_RADIUS_KM) -> float:
    """ghhsin(geohash, geohash, radius) — GeohashHaversineFunction
    (solr/.../search/function/distance/GeohashHaversineFunction.java:
    85-98): haversine between the DECODED CELL CENTERS; a null/empty
    hash yields Double.MAX_VALUE (:94-95)."""
    if not gh1 or not gh2:
        return 1.7976931348623157e308
    lat1, lon1 = decode(gh1)
    lat2, lon2 = decode(gh2)
    return haversine_km(lat1, lon1, lat2, lon2, radius)
