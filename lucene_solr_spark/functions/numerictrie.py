"""NumericUtils trie-range decomposition: the precisionStep split that
backs NumericRangeQuery / TrieField.

Reference semantics mirrored:
  - NumericUtils.splitRange (lucene/core/src/java/org/apache/lucene/
    util/NumericUtils.java:341-377): per precision level (shift grows
    by precisionStep) the range's unaligned head and tail are emitted
    at the CURRENT shift and the aligned middle recurses one level up;
    termination when the next precision exceeds the value size, the
    inner bounds cross, or the +/- diff adjustment wraps (the
    LUCENE-2541 extreme-value guards :358-360).
  - addRange (:379-399): the emitted max bound gets all shifted-away
    low bits set, so the (min, max, shift) triples reconstruct the
    full range exactly — the property our relational execution uses
    (each triple is one BETWEEN predicate; the triples partition the
    original range).

This engine stores numerics as native columns and answers range
queries with one pushed-down BETWEEN (SURVEY.md data-model row —
Catalyst needs no trie), so this module exists for semantic parity:
the decomposition is gated bit-for-bit against the reference's own
TestNumericUtils vectors, and the entry gates the partition property
(disjoint cover) on real data by comparing the per-triple counts'
sum against an independent whole-range count.
"""

from __future__ import annotations

from typing import List, Tuple

__all__ = ["split_long_range", "split_int_range"]

_U64 = (1 << 64) - 1
_U32 = (1 << 32) - 1


def _s64(x: int) -> int:
    x &= _U64
    return x - (1 << 64) if x >= (1 << 63) else x


def _s32(x: int) -> int:
    x &= _U32
    return x - (1 << 32) if x >= (1 << 31) else x


def _split(val_size: int, precision_step: int,
           min_bound: int, max_bound: int) -> List[Tuple[int, int, int]]:
    if precision_step < 1:
        raise ValueError("precisionStep must be >=1")
    signed = _s64 if val_size == 64 else _s32
    out: List[Tuple[int, int, int]] = []
    if min_bound > max_bound:
        return out
    shift = 0
    while True:
        diff = signed(1 << (shift + precision_step))
        mask = signed(((1 << precision_step) - 1) << shift)
        has_lower = (min_bound & mask) != 0
        has_upper = (max_bound & mask) != mask
        next_min = signed(
            (min_bound + diff if has_lower else min_bound) & ~mask)
        next_max = signed(
            (max_bound - diff if has_upper else max_bound) & ~mask)
        lower_wrapped = next_min < min_bound
        upper_wrapped = next_max > max_bound

        if (shift + precision_step >= val_size or next_min > next_max
                or lower_wrapped or upper_wrapped):
            out.append(_add_range(min_bound, max_bound, shift))
            break
        if has_lower:
            out.append(_add_range(min_bound, signed(min_bound | mask),
                                  shift))
        if has_upper:
            out.append(_add_range(signed(max_bound & ~mask), max_bound,
                                  shift))
        min_bound, max_bound = next_min, next_max
        shift += precision_step
    return out


def _add_range(min_bound: int, max_bound: int,
               shift: int) -> Tuple[int, int, int]:
    # :379-399 — set all shifted-away low bits on the max bound
    return (min_bound, max_bound | ((1 << shift) - 1), shift)


def split_long_range(precision_step: int, min_bound: int,
                     max_bound: int) -> List[Tuple[int, int, int]]:
    """splitLongRange (:318-323): [(min, max, shift)] triples whose
    BETWEEN predicates partition [min_bound, max_bound]."""
    return _split(64, precision_step, min_bound, max_bound)


def split_int_range(precision_step: int, min_bound: int,
                    max_bound: int) -> List[Tuple[int, int, int]]:
    """splitIntRange (:332-337), 32-bit twin."""
    return _split(32, precision_step, min_bound, max_bound)
