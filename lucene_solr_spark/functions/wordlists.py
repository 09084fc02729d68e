"""Wordlist resource parsing + the tee/sink one-pass splitter.

Reference semantics mirrored:
  - WordlistLoader (analysis/common/.../util/WordlistLoader.java):
    get_word_set — one word per line, trimmed (:54-66); the comment
    variant skips lines that START with the comment string BEFORE
    trimming (:109-125, startsWith on the raw line — kept);
    get_snowball_word_set — '|' truncates the line, remaining words
    split on whitespace (:142-159); get_stem_dict — TAB-split into
    (word, stem) with at most one split (:189-200, split("\\t", 2));
    get_lines — non-blank non-'#' lines trimmed (:203-230; a UTF-8
    BOM on the first line is stripped per the reference's
    getBufferedReader/#getLines behavior).
  - TeeSinkTokenFilter (analysis/common/.../sinks/TeeSinkTokenFilter.
    java:99-210): ONE pass over the source stream; every token is
    offered to every sink IN REGISTRATION ORDER and captured into
    each sink whose SinkFilter accepts it; the source stream itself
    is unchanged. Relationally this is "analyze once, emit several
    filtered streams from the same Arrow pass" — the whole point of
    the operator at scale (no second tokenization of 100 TB).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

__all__ = [
    "get_word_set",
    "get_snowball_word_set",
    "get_stem_dict",
    "get_lines",
    "tee_sink",
    "token_range_sink",
    "token_type_sink",
    "date_recognizer_sink",
]


def get_word_set(text: str, comment: str = None) -> set:
    out = set()
    for line in text.splitlines():
        if comment is not None and line.startswith(comment):
            continue
        out.add(line.strip())
    return out


def get_snowball_word_set(text: str) -> set:
    out = set()
    for line in text.splitlines():
        bar = line.find("|")
        if bar >= 0:
            line = line[:bar]
        for w in line.split():
            if w:
                out.add(w)
    return out


def get_stem_dict(text: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    for line in text.splitlines():
        word, stem = line.split("\t", 1)
        out[word] = stem
    return out


def get_lines(text: str) -> List[str]:
    out: List[str] = []
    first = True
    for line in text.splitlines():
        if first:
            line = line.lstrip("﻿")
            first = False
        s = line.strip()
        if s and not line.startswith("#"):
            out.append(s)
    return out


def tee_sink(
    tp: List[Tuple[str, int]],
    sinks: Dict[str, Callable[[str, int], bool]],
) -> Tuple[List[Tuple[str, int]], Dict[str, List[Tuple[str, int]]]]:
    """One pass: returns (source stream unchanged, per-sink accepted
    sub-streams in registration order)."""
    captured: Dict[str, List[Tuple[str, int]]] = {
        name: [] for name in sinks
    }
    for t, p in tp:
        for name, accept in sinks.items():
            if accept(t, p):
                captured[name].append((t, p))
    return list(tp), captured


# ---------------------------------------------------------------------------
# Concrete SinkFilters (analysis/common/.../sinks/)
# ---------------------------------------------------------------------------

def token_range_sink(lower: int, upper: int):
    """TokenRangeSinkFilter (sinks/TokenRangeSinkFilter.java:28-56):
    accept the tokens whose running index lies in [lower, upper) —
    the counter increments for EVERY offered token (the finally
    block), accepted or not. Stateful: build a fresh instance per
    stream (the reference's reset())."""
    count = [0]

    def accept(t: str, p: int) -> bool:
        try:
            return lower <= count[0] < upper
        finally:
            count[0] += 1

    return accept


def token_type_sink(type_to_match: str):
    """TokenTypeSinkFilter (sinks/TokenTypeSinkFilter.java:33-43):
    accept tokens whose TypeAttribute equals typeToMatch. The type is
    derived from the token text exactly as the indexing chain derives
    it (jflex NUM-vs-ALPHANUM resolution, functions/analysis.
    token_type)."""
    from lucene_solr_spark.functions.analysis import token_type

    return lambda t, p: token_type(t) == type_to_match


def date_recognizer_sink(parse=None):
    """DateRecognizerSinkFilter (sinks/DateRecognizerSinkFilter.java:
    44-59): accept tokens the injected DateFormat can parse; parse
    failures reject. The DateFormat is an injection point in the
    reference (constructor arg); the default here accepts ISO
    yyyy-mm-dd and US mm/dd/yyyy token shapes via datetime.strptime —
    any callable str -> bool-convertible can replace it, mirroring
    the injectable-DateFormat contract."""
    if parse is None:
        from datetime import datetime

        def parse(s: str):
            for fmt in ("%Y-%m-%d", "%m/%d/%Y"):
                try:
                    return datetime.strptime(s, fmt)
                except ValueError:
                    continue
            return None

    def accept(t: str, p: int) -> bool:
        try:
            return parse(t) is not None
        except Exception:
            return False

    return accept
