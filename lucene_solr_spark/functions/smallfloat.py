"""Bit-exact re-implementation of Lucene's SmallFloat 8-bit float codec
(3 mantissa bits, zero exponent 15) used for BM25 norm bytes.

Reference semantics: lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:78-98 (floatToByte315 / byte315ToFloat). BM25 encodes
boost/sqrt(fieldLength) with floatToByte315
(BM25Similarity.java:95-103) and decodes via a 256-entry table of
1/(f*f) (BM25Similarity.java:126-134) — i.e. the decoded value is the
quantized field length.

All functions are vectorized numpy; scalar ints accepted too.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "float_to_byte315",
    "byte315_to_float",
    "NORM_TABLE",
    "encode_norm",
    "LENGTH_TABLE",
]


def float_to_byte315(f):
    """Vectorized SmallFloat.floatToByte315 (SmallFloat.java:78-88).

    Input: float32 array/scalar. Output: uint8 array/scalar with the same
    bit pattern Java's (byte) cast would produce (Java byte -1 == 0xFF).
    """
    f32 = np.asarray(f, dtype=np.float32)
    bits = f32.view(np.int32)
    smallfloat = bits >> (24 - 3)
    lo = (63 - 15) << 3
    out = (smallfloat - lo).astype(np.int64)
    # underflow: (bits <= 0) -> 0 else 1
    out = np.where(smallfloat <= lo, np.where(bits <= 0, 0, 1), out)
    # overflow: -1 == 0xFF as unsigned byte
    out = np.where(smallfloat >= lo + 0x100, 0xFF, out)
    res = out.astype(np.uint8)
    return res if res.ndim else res[()]


def byte315_to_float(b):
    """Vectorized SmallFloat.byte315ToFloat (SmallFloat.java:90-98)."""
    ub = np.asarray(b, dtype=np.uint8).astype(np.int32)
    bits = (ub << (24 - 3)) + ((63 - 15) << 24)
    out = bits.astype(np.int32).view(np.float32)
    out = np.where(ub == 0, np.float32(0.0), out).astype(np.float32)
    return out if out.ndim else out[()]


# BM25Similarity.NORM_TABLE (BM25Similarity.java:126-134):
# NORM_TABLE[i] = 1f / (f*f) where f = byte315ToFloat(i); index 0 -> inf
# in Java (1/0.0f); we keep the same float32 inf.
_f = byte315_to_float(np.arange(256, dtype=np.uint8))
with np.errstate(divide="ignore"):
    NORM_TABLE = (np.float32(1.0) / (_f * _f)).astype(np.float32)
del _f


def encode_norm(field_length, boost=None):
    """BM25Similarity.encodeNormValue (BM25Similarity.java:95-103):
    floatToByte315(boost / (float) Math.sqrt(fieldLength)).

    field_length: int array/scalar (tokens that reached the inverter,
    i.e. after StopFilter; FieldInvertState.length - numOverlap).
    boost: per-field boost, default 1.0f.
    """
    length = np.asarray(field_length, dtype=np.float64)
    # Java: (float) Math.sqrt(double) then float division
    sq = np.sqrt(length).astype(np.float32)
    if boost is None:
        val = (np.float32(1.0) / sq).astype(np.float32)
    else:
        val = (np.asarray(boost, dtype=np.float32) / sq).astype(np.float32)
    return float_to_byte315(val)


# Quantized field length per norm byte: LENGTH_TABLE[b] = decoded length
# (= NORM_TABLE[b] since decode is 1/(norm^2)). Alias for readability.
LENGTH_TABLE = NORM_TABLE
