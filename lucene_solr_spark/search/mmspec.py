"""Solr min-should-match spec parser (solr/core/src/java/org/apache/
solr/util/SolrPluginUtils.java calculateMinShouldMatch): the dismax
``mm`` parameter grammar.

  "3"          exactly 3 optional clauses must match
  "-2"         all but 2
  "75%"        (int)(n * 75 * 0.01f) clauses (float32 truncation!)
  "-25%"       n + (int)(n * -25 * 0.01f)
  "2<-25% 9<3" conditional: for n <= 2 all clauses required; the
               conditionals apply left to right, each replacing the
               result when n > its bound (SolrPluginUtils:~520)

The percentage path reproduces the reference's float32 arithmetic
bit-for-bit: calc = (n * percent) * (1/100f) — note 1/100f is NOT 0.01
(it is 0.00999999977...f), so e.g. n=4, "-25%" gives (int)(-0.99999997)
= 0 -> mm stays 4, where exact math would give 3. Ranking parity
requires keeping the quirk.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = ["calculate_min_should_match"]

_SPACE_AROUND_LT = re.compile(r"\s*<\s*")
_SPACES = re.compile(r"\s+")

# 1/100f evaluated once in float32, exactly as the Java constant
_ONE_HUNDREDTH_F = np.float32(1.0) / np.float32(100.0)


def calculate_min_should_match(optional_clause_count: int,
                               spec: str) -> int:
    n = int(optional_clause_count)
    result = n
    spec = spec.strip()

    if "<" in spec:
        spec = _SPACE_AROUND_LT.sub("<", spec)
        for s in _SPACES.split(spec):
            upper_s, _, rhs = s.partition("<")
            upper = int(upper_s)
            if n <= upper:
                return result
            result = calculate_min_should_match(n, rhs)
        return result

    if "%" in spec:
        # the reference assumes % is the last char and lets parseInt
        # fail otherwise (SolrPluginUtils: "assume the % was the last
        # char. If not, let Integer.parseInt fail.")
        percent = int(spec[:-1])
        calc = np.float32(np.float32(result * percent) * _ONE_HUNDREDTH_F)
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc

    return n if n < result else (0 if result < 0 else result)
