"""SpellingQueryConverter re-expression (solr/core/src/java/org/
apache/solr/spelling/SpellingQueryConverter.java): extract the
spell-checkable tokens from a RAW query string without a full parse.

Reference rules kept exactly:
- token regex ``(?:(?!(NMTOKEN:|\\d+)))[\\pL_\\-0-9]+`` (:96): a
  negative lookahead skips ``field:`` NAME prefixes (the VALUE after
  the colon still matches) and pure-digit runs.
- AND/OR/NOT matches are operator markers, not terms (:129-132);
  an ``AND NOT`` sequence collapses to NOT via the raw-substring
  lookahead (:135-140).
- flags (QueryConverter.java:58-78): PROHIBITED (16384) for a leading
  or immediately-preceding '-', REQUIRED (32768) for '+',
  TERM_PRECEDES_NEW_BOOLEAN_OPERATOR (65536) when the NEXT word is a
  boolean operator different from the last one seen (first-operator
  special case: only NOT counts, :150-161), and
  TERM_IN_BOOLEAN_QUERY (131072) OR-ed into EVERY token when any
  boolean operator appeared (:168-173).
- each extracted word then runs through the analysis chain with its
  original start offset (:163-166); stop-filtered words vanish.
"""

from __future__ import annotations

import re
from typing import List, Tuple

PROHIBITED_TERM_FLAG = 16384
REQUIRED_TERM_FLAG = 32768
TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG = 65536
TERM_IN_BOOLEAN_QUERY_FLAG = 131072

# NMTOKEN approximated as [\w\-.]+ (the reference's full XML NAMECHAR
# table only widens the skip to more Unicode blocks); the main token
# class [\w\-] is the reference's [\p{L}_\-0-9]. Lookahead semantics
# verbatim: a position where 'NMTOKEN:' or a digit run starts cannot
# begin a token (so '123abc' yields 'abc', 'lang:en' yields 'en').
_NMTOKEN = r"[\w\-.]+"
_PATTERN = re.compile(
    r"(?!(?:" + _NMTOKEN + r":|\d+))[\w\-]+", re.UNICODE)


def convert(original: str, analyzer=None
            ) -> List[Tuple[str, int, int]]:
    """Returns [(analyzed_term, start_offset, flags)] — the Token
    collection of SpellingQueryConverter.convert (:106-176)."""
    if original is None:
        return []
    if analyzer is None:
        from lucene_solr_spark.functions.analysis import get_analyzer
        analyzer = get_analyzer("standard")

    matches = [(m.group(0), m.start()) for m in
               _PATTERN.finditer(original)]
    result: List[Tuple[str, int, int]] = []
    last_bool = None
    i = 0
    n = len(matches)
    while i < n:
        word, start = matches[i]
        nxt = matches[i + 1] if i + 1 < n else None
        if word in ("AND", "OR", "NOT"):
            last_bool = word
            i += 1
            continue
        next_word = nxt[0] if nxt else None
        # "AND NOT" collapses to NOT (:135-140)
        if (next_word == "AND" and nxt is not None
                and original[nxt[1]:nxt[1] + 7] == "AND NOT"):
            next_word = "NOT"
            matches[i + 1] = ("NOT", nxt[1])
        flags = 0
        if word[0] == "-" or (start > 0 and original[start - 1] == "-"):
            flags = PROHIBITED_TERM_FLAG
        elif word[0] == "+" or (start > 0 and original[start - 1] == "+"):
            flags = REQUIRED_TERM_FLAG
        elif (next_word is not None and last_bool is not None
                and next_word != last_bool
                and next_word in ("AND", "OR", "NOT")):
            flags = TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG
        elif (next_word is not None and last_bool is None
                and next_word == "NOT"):
            flags = TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG
        for t in analyzer.analyze(word):
            result.append((t, start, flags))
        i += 1
    if last_bool is not None:
        result = [(t, s, f | TERM_IN_BOOLEAN_QUERY_FLAG)
                  for t, s, f in result]
    return result
