"""SolrCloud document routing (solrj/src/java/org/apache/solr/common/
cloud/: DocRouter.java, HashBasedRouter.java, CompositeIdRouter.java;
solrj/.../common/util/Hash.java murmurhash3_x86_32).

Reference model: every doc's uniqueKey hashes onto a signed-int32 ring;
the collection's N slices own contiguous inclusive [min,max] ranges
produced by DocRouter.partitionRange (DocRouter.java:130-155).
CompositeIdRouter (compositeId, the default) additionally supports
``tenant!id`` keys: 16 high bits from murmur3(tenant), 16 low bits from
murmur3(id) (CompositeIdRouter.sliceHash, :62-88), with an optional
``tenant/bits!id`` mask override (:43-58).  Query-side ``_route_``
params map a shard key to the slice range(s) it can live in
(getSearchSlicesSingle, :90-140).

Spark shape: the hash is a vectorized numpy murmur3 over UTF-8 bytes
(Arrow pandas_udf — no per-row Python in the executor path), and
routing IS partitioning: ``route()`` adds the shard column; a
build that wants SolrCloud-parity placement repartitions on it, so at
100 TB co-located tenants (`tenant!` prefixes sharing high bits) land
on the same shard exactly as the reference ring places them, and a
``_route_``-scoped query prunes to the matching shard partitions
instead of fanning out.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

INT32_MIN = -(1 << 31)
INT32_MAX = (1 << 31) - 1

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


# --- scalar reference (Hash.java:243-292, byte[] variant) -------------------

def murmur3_x86_32(data, seed: int = 0) -> int:
    """Bit-exact scalar port of Hash.murmurhash3_x86_32(byte[],int,int,
    int).  Accepts str (hashed as UTF-8, like the CharSequence variant
    Hash.java:300) or bytes.  Returns a SIGNED int32 like the JVM."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    m = 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & m
    n = len(data)
    rounded = n & ~3
    for i in range(0, rounded, 4):
        k1 = (data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
              | (data[i + 3] << 24))
        k1 = (k1 * c1) & m
        k1 = ((k1 << 15) | (k1 >> 17)) & m
        k1 = (k1 * c2) & m
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & m
        h1 = (h1 * 5 + 0xE6546B64) & m
    k1 = 0
    rem = n & 3
    if rem == 3:
        k1 = data[rounded + 2] << 16
    if rem >= 2:
        k1 |= data[rounded + 1] << 8
    if rem >= 1:
        k1 |= data[rounded]
        k1 = (k1 * c1) & m
        k1 = ((k1 << 15) | (k1 >> 17)) & m
        k1 = (k1 * c2) & m
        h1 ^= k1
    h1 ^= n
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


# --- vectorized murmur3 (the executor path) ---------------------------------

def murmur3_x86_32_np(strings: pd.Series, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3_x86_32 over a Series of strings: one padded
    uint8 matrix, block loop over the max block count with per-row
    active masks (keys are short, so the loop is tiny), uint32
    wraparound arithmetic throughout.  Returns int32 (signed, JVM
    parity).  Gated bit-exact against the scalar port in
    tests/test_cloud_router.py."""
    raw = [s.encode("utf-8") for s in strings.fillna("").astype(str)]
    n = len(raw)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    lens = np.fromiter((len(b) for b in raw), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    width = ((maxlen + 3) // 4) * 4 or 4
    mat = np.zeros((n, width), dtype=np.uint8)
    for i, b in enumerate(raw):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    nblocks = (lens >> 2).astype(np.int64)
    h1 = np.full(n, np.uint32(seed), dtype=np.uint32)
    with np.errstate(over="ignore"):
        for blk in range(int(nblocks.max()) if n else 0):
            act = nblocks > blk
            if not act.any():
                break
            o = blk * 4
            k1 = (mat[act, o].astype(np.uint32)
                  | (mat[act, o + 1].astype(np.uint32) << 8)
                  | (mat[act, o + 2].astype(np.uint32) << 16)
                  | (mat[act, o + 3].astype(np.uint32) << 24))
            k1 *= _C1
            k1 = (k1 << np.uint32(15)) | (k1 >> np.uint32(17))
            k1 *= _C2
            h = h1[act]
            h ^= k1
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
            h1[act] = h
        # tail (Hash.java:264-279): bytes at 4*nblocks+{0,1,2}
        rem = (lens & 3).astype(np.int64)
        base = nblocks * 4
        k1 = np.zeros(n, dtype=np.uint32)
        rows = np.arange(n)
        m3 = rem == 3
        if m3.any():
            k1[m3] = mat[rows[m3], base[m3] + 2].astype(np.uint32) << 16
        m2 = rem >= 2
        if m2.any():
            k1[m2] |= mat[rows[m2], base[m2] + 1].astype(np.uint32) << 8
        m1 = rem >= 1
        if m1.any():
            t = k1[m1] | mat[rows[m1], base[m1]].astype(np.uint32)
            t *= _C1
            t = (t << np.uint32(15)) | (t >> np.uint32(17))
            t *= _C2
            h1[m1] ^= t
        # finalization / fmix
        h1 ^= lens.astype(np.uint32)
        h1 ^= h1 >> np.uint32(16)
        h1 *= np.uint32(0x85EBCA6B)
        h1 ^= h1 >> np.uint32(13)
        h1 *= np.uint32(0xC2B2AE35)
        h1 ^= h1 >> np.uint32(16)
    return h1.view(np.int32)


# --- CompositeIdRouter.sliceHash ---------------------------------------------

def _masks(bits: int) -> Tuple[int, int]:
    """mask1/mask2 as uint32 (CompositeIdRouter.setBits:45-48; java
    -1<<k / -1>>>k on the signed int, expressed unsigned)."""
    m1 = 0 if bits == 0 else (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF
    m2 = 0 if bits == 32 else 0xFFFFFFFF >> bits
    return m1, m2


def _parse_bits(part1: str) -> Tuple[str, Optional[int]]:
    """'tenant/8' -> ('tenant', 8); invalid bit specs are ignored like
    getBits returning -1 (CompositeIdRouter.java:51-59, 73-80)."""
    comma = part1.find("/")
    if comma > 0:
        spec = part1[comma + 1:]
        if spec.isdigit() and int(spec) <= 32:
            return part1[:comma], int(spec)
    return part1, None


def slice_hash(doc_id: str) -> int:
    """Scalar CompositeIdRouter.sliceHash (:62-88)."""
    idx = doc_id.find("!")
    if idx < 0:
        return murmur3_x86_32(doc_id)
    part1, bits = _parse_bits(doc_id[:idx])
    m1, m2 = _masks(16 if bits is None else bits)
    part2 = doc_id[idx + 1:]
    h1 = murmur3_x86_32(part1) & 0xFFFFFFFF
    h2 = murmur3_x86_32(part2) & 0xFFFFFFFF
    h = (h1 & m1) | (h2 & m2)
    return h - (1 << 32) if h >= (1 << 31) else h


def slice_hash_np(ids: pd.Series) -> np.ndarray:
    """Vectorized sliceHash: partition on '!', hash both sides, apply
    the bit masks.  Rows without '!' take the plain-id path."""
    s = ids.fillna("").astype(str)
    has_sep = s.str.contains("!", regex=False).to_numpy()
    out = np.zeros(len(s), dtype=np.int64)
    if (~has_sep).any():
        out[~has_sep] = murmur3_x86_32_np(s[~has_sep]).astype(np.int64)
    if has_sep.any():
        comp = s[has_sep]
        parts = comp.str.partition("!")
        p1, bits_list = [], []
        for v in parts[0]:
            a, b = _parse_bits(v)
            p1.append(a)
            bits_list.append(16 if b is None else b)
        h1 = murmur3_x86_32_np(pd.Series(p1)).astype(np.int64) \
            & 0xFFFFFFFF
        h2 = murmur3_x86_32_np(parts[2]).astype(np.int64) & 0xFFFFFFFF
        m1 = np.fromiter((_masks(b)[0] for b in bits_list),
                         dtype=np.int64, count=len(bits_list))
        m2 = np.fromiter((_masks(b)[1] for b in bits_list),
                         dtype=np.int64, count=len(bits_list))
        h = (h1 & m1) | (h2 & m2)
        h = np.where(h >= (1 << 31), h - (1 << 32), h)
        out[has_sep] = h
    return out.astype(np.int32)


# --- ring partitioning + routing ---------------------------------------------

def partition_ranges(partitions: int,
                     rmin: int = INT32_MIN,
                     rmax: int = INT32_MAX) -> List[Tuple[int, int]]:
    """DocRouter.partitionRange (:130-155): inclusive [start,end]
    ranges, fixed floor step, the LAST range pinned to max."""
    if partitions == 0:
        return []
    range_size = rmax - rmin
    step = max(1, range_size // partitions)
    ranges: List[Tuple[int, int]] = []
    start = rmin
    end = start
    while end < rmax:
        end = start + step
        if len(ranges) == partitions - 1:
            end = rmax
        ranges.append((start, end))
        start = end + 1
    return ranges


def shard_of(hashes: np.ndarray,
             ranges: List[Tuple[int, int]]) -> np.ndarray:
    """hashToSlice (HashBasedRouter.java:55-61) vectorized: the slice
    whose inclusive range contains the hash.  partitionRange emits
    sorted contiguous ranges, so searchsorted on the mins is exact."""
    mins = np.array([r[0] for r in ranges], dtype=np.int64)
    idx = np.searchsorted(mins, hashes.astype(np.int64), side="right") - 1
    return idx.astype(np.int32)


def route(df, id_col: str, n_shards: int, out_col: str = "shard"):
    """Add the compositeId shard assignment as a column.  One Arrow
    pandas_udf; repartition(n_shards, out_col) after this gives
    SolrCloud-parity physical placement."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    ranges = partition_ranges(n_shards)

    @pandas_udf("int")
    def _shard(ids: pd.Series) -> pd.Series:
        return pd.Series(shard_of(slice_hash_np(ids), ranges))

    return df.withColumn(out_col, _shard(F.col(id_col)))


def search_slices(shard_key: Optional[str],
                  n_shards: int) -> List[int]:
    """Query-side _route_ pruning (getSearchSlicesSingle, :90-140):
    None -> all slices; 'id' (no '!') -> the one slice of its hash;
    'tenant!' -> every slice overlapping [h1&m1, (h1&m1)|m2]."""
    ranges = partition_ranges(n_shards)
    if shard_key is None:
        return list(range(n_shards))
    idx = shard_key.find("!")
    if idx < 0:
        h = murmur3_x86_32(shard_key)
        return [int(shard_of(np.array([h]), ranges)[0])]
    part1, bits = _parse_bits(shard_key[:idx])
    m1, m2 = _masks(16 if bits is None else bits)
    h1 = murmur3_x86_32(part1) & 0xFFFFFFFF
    upper = h1 & m1
    lo, hi = upper, upper | m2
    if m1 == 0:
        lo, hi = INT32_MIN, INT32_MAX
    else:
        lo = lo - (1 << 32) if lo >= (1 << 31) else lo
        hi = hi - (1 << 32) if hi >= (1 << 31) else hi
    return [i for i, (rmin, rmax) in enumerate(ranges)
            if rmin <= hi and rmax >= lo]
