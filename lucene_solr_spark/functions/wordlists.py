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
