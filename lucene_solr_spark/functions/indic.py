"""IndicNormalizer — Unicode composition normalization for the nine
Indic scripts, a numeric port of the reference's
analysis/common/src/java/org/apache/lucene/analysis/in/
IndicNormalizer.java (Unicode 5.2 ch.6 South Asian Scripts I plus the
LDC graphical decompositions; the table below reproduces the
reference's decompositions[][] rows verbatim as data).

Semantics replayed exactly (IndicNormalizer.java:244-293):
- one LEFT-TO-RIGHT pass; at each index, if the char belongs to an
  Indic block and its in-block offset is in that script's decomp
  mask, try to compose with the next 1-2 chars;
- the following char must be in the SAME block; a third char is
  matched as 0xFF when it is ZWJ (U+200D), as -1 (two-char rule only)
  when it is from another block;
- the FIRST matching table row wins (table scan order is
  significant); the composed char replaces the window and the scan
  continues after it (composed output is not re-examined).
"""
from functools import lru_cache

# script flag bits and block bases (IndicNormalizer.java:52-62); each
# block spans exactly 0x80 codepoints starting at its base
DEVANAGARI = 1
BENGALI = 2
GURMUKHI = 4
GUJARATI = 8
ORIYA = 16
TAMIL = 32
TELUGU = 64
KANNADA = 128
MALAYALAM = 256

_BASES = (
    (0x0900, DEVANAGARI), (0x0980, BENGALI), (0x0A00, GURMUKHI),
    (0x0A80, GUJARATI), (0x0B00, ORIYA), (0x0B80, TAMIL),
    (0x0C00, TELUGU), (0x0C80, KANNADA), (0x0D00, MALAYALAM),
)

# rows: (ch1, ch2, ch3, res, flags) — offsets into the script's
# codepage; -1 = absent third char, 0xFF = zero-width joiner
# (IndicNormalizer.java:76-227, order preserved)
DECOMPOSITIONS = (
    (0x05, 0x3E, 0x45, 0x11, DEVANAGARI | GUJARATI),
    (0x05, 0x3E, 0x46, 0x12, DEVANAGARI),
    (0x05, 0x3E, 0x47, 0x13, DEVANAGARI | GUJARATI),
    (0x05, 0x3E, 0x48, 0x14, DEVANAGARI | GUJARATI),
    (0x05, 0x3E, -1, 0x06,
     DEVANAGARI | BENGALI | GURMUKHI | GUJARATI | ORIYA),
    (0x05, 0x45, -1, 0x72, DEVANAGARI),
    (0x05, 0x45, -1, 0x0D, GUJARATI),
    (0x05, 0x46, -1, 0x04, DEVANAGARI),
    (0x05, 0x47, -1, 0x0F, GUJARATI),
    (0x05, 0x48, -1, 0x10, GURMUKHI | GUJARATI),
    (0x05, 0x49, -1, 0x11, DEVANAGARI | GUJARATI),
    (0x05, 0x4A, -1, 0x12, DEVANAGARI),
    (0x05, 0x4B, -1, 0x13, DEVANAGARI | GUJARATI),
    (0x05, 0x4C, -1, 0x14, DEVANAGARI | GURMUKHI | GUJARATI),
    (0x06, 0x45, -1, 0x11, DEVANAGARI | GUJARATI),
    (0x06, 0x46, -1, 0x12, DEVANAGARI),
    (0x06, 0x47, -1, 0x13, DEVANAGARI | GUJARATI),
    (0x06, 0x48, -1, 0x14, DEVANAGARI | GUJARATI),
    (0x07, 0x57, -1, 0x08, MALAYALAM),
    (0x09, 0x41, -1, 0x0A, DEVANAGARI),
    (0x09, 0x57, -1, 0x0A, TAMIL | MALAYALAM),
    (0x0E, 0x46, -1, 0x10, MALAYALAM),
    (0x0F, 0x45, -1, 0x0D, DEVANAGARI),
    (0x0F, 0x46, -1, 0x0E, DEVANAGARI),
    (0x0F, 0x47, -1, 0x10, DEVANAGARI),
    (0x0F, 0x57, -1, 0x10, ORIYA),
    (0x12, 0x3E, -1, 0x13, MALAYALAM),
    (0x12, 0x4C, -1, 0x14, TELUGU | KANNADA),
    (0x12, 0x55, -1, 0x13, TELUGU),
    (0x12, 0x57, -1, 0x14, TAMIL | MALAYALAM),
    (0x13, 0x57, -1, 0x14, ORIYA),
    (0x15, 0x3C, -1, 0x58, DEVANAGARI),
    (0x16, 0x3C, -1, 0x59, DEVANAGARI | GURMUKHI),
    (0x17, 0x3C, -1, 0x5A, DEVANAGARI | GURMUKHI),
    (0x1C, 0x3C, -1, 0x5B, DEVANAGARI | GURMUKHI),
    (0x21, 0x3C, -1, 0x5C, DEVANAGARI | BENGALI | ORIYA),
    (0x22, 0x3C, -1, 0x5D, DEVANAGARI | BENGALI | ORIYA),
    (0x23, 0x4D, 0xFF, 0x7A, MALAYALAM),
    (0x24, 0x4D, 0xFF, 0x4E, BENGALI),
    (0x28, 0x3C, -1, 0x29, DEVANAGARI),
    (0x28, 0x4D, 0xFF, 0x7B, MALAYALAM),
    (0x2B, 0x3C, -1, 0x5E, DEVANAGARI | GURMUKHI),
    (0x2F, 0x3C, -1, 0x5F, DEVANAGARI | BENGALI),
    (0x2C, 0x41, 0x41, 0x0B, TELUGU),
    (0x30, 0x3C, -1, 0x31, DEVANAGARI),
    (0x30, 0x4D, 0xFF, 0x7C, MALAYALAM),
    (0x32, 0x4D, 0xFF, 0x7D, MALAYALAM),
    (0x33, 0x3C, -1, 0x34, DEVANAGARI),
    (0x33, 0x4D, 0xFF, 0x7E, MALAYALAM),
    (0x35, 0x41, -1, 0x2E, TELUGU),
    (0x3E, 0x45, -1, 0x49, DEVANAGARI | GUJARATI),
    (0x3E, 0x46, -1, 0x4A, DEVANAGARI),
    (0x3E, 0x47, -1, 0x4B, DEVANAGARI | GUJARATI),
    (0x3E, 0x48, -1, 0x4C, DEVANAGARI | GUJARATI),
    (0x3F, 0x55, -1, 0x40, KANNADA),
    (0x41, 0x41, -1, 0x42, GURMUKHI),
    (0x46, 0x3E, -1, 0x4A, TAMIL | MALAYALAM),
    (0x46, 0x42, 0x55, 0x4B, KANNADA),
    (0x46, 0x42, -1, 0x4A, KANNADA),
    (0x46, 0x46, -1, 0x48, MALAYALAM),
    (0x46, 0x55, -1, 0x47, TELUGU | KANNADA),
    (0x46, 0x56, -1, 0x48, TELUGU | KANNADA),
    (0x46, 0x57, -1, 0x4C, TAMIL | MALAYALAM),
    (0x47, 0x3E, -1, 0x4B, BENGALI | ORIYA | TAMIL | MALAYALAM),
    (0x47, 0x57, -1, 0x4C, BENGALI | ORIYA),
    (0x4A, 0x55, -1, 0x4B, KANNADA),
    (0x72, 0x3F, -1, 0x07, GURMUKHI),
    (0x72, 0x40, -1, 0x08, GURMUKHI),
    (0x72, 0x47, -1, 0x0F, GURMUKHI),
    (0x73, 0x41, -1, 0x09, GURMUKHI),
    (0x73, 0x42, -1, 0x0A, GURMUKHI),
    (0x73, 0x4B, -1, 0x13, GURMUKHI),
)

# per-script decomposition-start mask (IndicNormalizer.java:229-238)
_DECOMP_STARTS = {}
for _base, _flag in _BASES:
    _DECOMP_STARTS[_base] = frozenset(
        row[0] for row in DECOMPOSITIONS if row[4] & _flag)


def _block_base(cp: int):
    """Return the Indic block base for a codepoint, or None. Blocks
    are the 0x80-codepoint Java UnicodeBlocks the reference keys on."""
    if 0x0900 <= cp <= 0x0D7F:
        base = cp & ~0x7F
        if base in _DECOMP_STARTS:
            return base
    return None


@lru_cache(maxsize=1 << 17)
def indic_normalize(term: str) -> str:
    """IndicNormalizer.normalize (IndicNormalizer.java:244-258): fold
    graphical decompositions into composed standard form, one pass."""
    buf = list(term)
    n = len(buf)
    i = 0
    while i < n:
        cp = ord(buf[i])
        base = _block_base(cp)
        if base is not None:
            ch0 = cp - base
            if ch0 in _DECOMP_STARTS[base]:
                flag = dict(_BASES)[base]
                n = _compose(ch0, base, flag, buf, i, n)
        i += 1
    return "".join(buf[:n])


def _compose(ch0: int, base: int, flag: int, buf, pos: int,
             n: int) -> int:
    """IndicNormalizer.compose (:263-293): first matching row wins;
    the window collapses to the composed char."""
    if pos + 1 >= n:
        return n
    cp1 = ord(buf[pos + 1])
    if _block_base(cp1) != base:
        return n
    ch1 = cp1 - base
    ch2 = -1
    if pos + 2 < n:
        cp2 = ord(buf[pos + 2])
        if cp2 == 0x200D:  # ZWJ
            ch2 = 0xFF
        elif _block_base(cp2) == base:
            ch2 = cp2 - base
    for r0, r1, r2, res, flags in DECOMPOSITIONS:
        if r0 == ch0 and (flags & flag):
            if r1 == ch1 and (r2 < 0 or r2 == ch2):
                buf[pos] = chr(base + res)
                del buf[pos + 1]
                n -= 1
                if r2 >= 0:
                    del buf[pos + 1]
                    n -= 1
                return n
    return n
