"""Thai word segmentation for the ThaiAnalyzer default chain.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
th/ThaiWordFilter.java:60-65 — the filter delegates word segmentation
to the PLATFORM's dictionary-backed BreakIterator (the JRE's Thai
DBBI), guarded by the DBBI_AVAILABLE static probe (:43-52, checked on
"ภาษาไทย") and splitting only tokens whose FIRST char is in the THAI
Unicode block (:99-101).

This port keeps the same external-runtime seam but delegates to the
platform's libthai (LGPL, dictionary-backed double-array trie at
/usr/share/libthai/thbrk.tri) through ctypes — public data + library,
loaded lazily so the handle is created per worker process, never
pickled into an Arrow UDF closure. libthai's th_brk operates on
TIS-620 bytes (single-byte for the whole Thai block, so byte breaks ==
char breaks); the reference JRE dictionary and libthai's agree on
every TestThaiAnalyzer golden segmentation (gated in
tests/test_thai.py). A Thai-leading token containing a codepoint
outside TIS-620 passes through UNSPLIT (documented engine fallback —
the reference would feed it to the DBBI, an unreachable path for
dictionary text).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional

_LIB: Optional[ctypes.CDLL] = None
_PROBED = False

# UnicodeBlock.THAI (ThaiWordFilter.java:99)
_THAI_LO = "฀"
_THAI_HI = "๿"


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _PROBED
    if _PROBED:
        return _LIB
    _PROBED = True
    try:
        lib = ctypes.CDLL("libthai.so.0")
        lib.th_brk.restype = ctypes.c_int
        lib.th_brk.argtypes = (ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.c_size_t)
        # DBBI_AVAILABLE probe (:47-52): segmentation must split the
        # probe word — a stub library that never breaks is "absent"
        _LIB = lib
        if thai_segment("ภาษาไทย") \
                == ["ภาษาไทย"]:
            _LIB = None
    except OSError:
        _LIB = None
    return _LIB


def thai_available() -> bool:
    """ThaiWordFilter.DBBI_AVAILABLE analogue for libthai."""
    return _load() is not None


def is_thai_leading(token: str) -> bool:
    """ThaiWordFilter splits only tokens whose first char is in the
    THAI block (ThaiWordFilter.java:99-101)."""
    return bool(token) and _THAI_LO <= token[0] <= _THAI_HI


def thai_segment(token: str) -> List[str]:
    """Break one Thai token into dictionary words (the per-token
    BreakIterator walk, ThaiWordFilter.java:115-130). Non-encodable
    or unavailable-library inputs return the token unsplit."""
    lib = _LIB
    if lib is None:
        lib = _load()
        if lib is None:
            return [token]
    try:
        b = token.encode("tis-620")
    except UnicodeEncodeError:
        return [token]
    n = len(b)
    pos = (ctypes.c_int * (n + 1))()
    k = lib.th_brk(b, pos, n + 1)
    cuts = [0]
    for i in range(k):
        p = int(pos[i])
        if 0 < p <= n and p != cuts[-1]:
            cuts.append(p)
    if cuts[-1] != n:
        cuts.append(n)
    return [b[cuts[i]:cuts[i + 1]].decode("tis-620")
            for i in range(len(cuts) - 1)]
