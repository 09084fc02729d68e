"""SmallFloat bit-exactness (FIXTURES.md section 5).

Golden values computed by hand from the Java bit operations in
lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:78-98.
"""

import math
import struct

import numpy as np

from lucene_solr_spark.functions.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    encode_norm,
    float_to_byte315,
)


def java_float_to_byte315(f: float) -> int:
    """Straight scalar transcription of the Java code, as an independent
    second implementation to cross-check the vectorized one."""
    bits = struct.unpack(">i", struct.pack(">f", f))[0]
    smallfloat = bits >> (24 - 3)
    if smallfloat <= ((63 - 15) << 3):
        return 0 if bits <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 0xFF
    return (smallfloat - ((63 - 15) << 3)) & 0xFF

def java_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = (b & 0xFF) << (24 - 3)
    bits += (63 - 15) << 24
    return struct.unpack(">f", struct.pack(">i", bits))[0]


def test_roundtrip_all_bytes():
    bs = np.arange(256, dtype=np.uint8)
    fs = byte315_to_float(bs)
    for i in range(256):
        assert fs[i] == np.float32(java_byte315_to_float(i)), i
    # re-encode is identity on the codec's value lattice
    back = float_to_byte315(fs)
    assert list(back) == list(bs)


def test_encode_matches_java_for_length_sweep():
    lens = np.arange(1, 10_001)
    got = encode_norm(lens)
    for n in (1, 2, 3, 7, 10, 100, 255, 256, 1000, 4096, 9999):
        f = np.float32(1.0) / np.float32(math.sqrt(float(n)))
        assert got[n - 1] == java_float_to_byte315(float(f)), n


def test_known_values():
    assert float_to_byte315(np.float32(0.0)) == 0
    assert float_to_byte315(np.float32(-1.0)) == 0
    assert float_to_byte315(np.float32(1.0)) == 124
    assert float_to_byte315(np.float32(float("inf"))) == 0xFF
    assert byte315_to_float(np.uint8(124)) == np.float32(1.0)
    # NORM_TABLE[b] == 1/(decode^2) == quantized field length
    assert NORM_TABLE[124] == np.float32(1.0)
    assert np.isinf(NORM_TABLE[0])


def test_monotone_nonincreasing_norm_for_growing_len():
    # longer field -> smaller 1/sqrt(len) -> byte must not increase
    prev = 256
    for n in range(1, 5000):
        b = int(encode_norm(n))
        assert b <= prev
        prev = b
