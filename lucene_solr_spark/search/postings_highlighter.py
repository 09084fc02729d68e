"""PostingsHighlighter re-expression.

Reference: ``lucene/highlighter/.../postingshighlight/
PostingsHighlighter.java`` (highlightDoc: offset-ordered merge of the
query terms' positions; a passage is the enclosing sentence span
[bi.preceding(start+1), bi.next()); per poll event all of a term's
occurrences inside the passage are consumed as one tf run and the
passage score accumulates ``weights[term] * tf(run, passageLen)`` in
f32, poll order = first occurrence order; passage finalization
multiplies ``norm(passageStart)``; a min-heap of size maxPassages
keeps the best passages — score ties evict the SMALLER startOffset;
final passages sort by startOffset),
``PassageScorer.java`` (k1=1.2 b=0.75 pivot=87;
weight = (k1+1)*(float)log(1+(numDocs+0.5D)/(ttf+0.5D)) with
numDocs = 1 + contentLength/pivot;
tf = freq/(freq + k1*((1-b) + b*passageLen/pivot));
norm = 1 + 1/(float)log(pivot+passageStart)) and
``DefaultPassageFormatter.java`` (wrap matches in <b></b>, join
passages with "... ").

Sentence segmentation: this engine targets machine-built corpora whose
sentence boundaries are exactly ``". "`` (terminator + single space),
for which the JDK ``BreakIterator.getSentenceInstance(Locale.ROOT)``
boundary set is { every index after ". ", contentLength } — we compute
that subset directly instead of porting the full UAX#29 sentence
rules (documented delta: abbreviation/ellipsis handling).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

F32 = np.float32

K1 = F32(1.2)
B = F32(0.75)
PIVOT = F32(87.0)


def sentence_bounds(content: str) -> List[int]:
    """Boundary offsets [b0=0, b1, ..., contentLength]; b_k is the
    index just after each '. ' separator."""
    out = [0]
    i = content.find(". ")
    while i != -1:
        out.append(i + 2)
        i = content.find(". ", i + 2)
    if not content or out[-1] != len(content):
        out.append(len(content))
    return out


def _weight(content_length: int, ttf: int) -> F32:
    # PassageScorer.weight (:72-77): f32 outer ops, double inner ratio
    num_docs = F32(1) + F32(content_length) / PIVOT
    inner = (float(num_docs) + 0.5) / (float(ttf) + 0.5)
    return (K1 + F32(1)) * F32(math.log(1.0 + inner))


def _tf(freq: int, passage_len: int) -> F32:
    norm = K1 * ((F32(1) - B) + B * (F32(passage_len) / PIVOT))
    return F32(freq) / (F32(freq) + norm)


def _norm(passage_start: int) -> F32:
    return F32(1) + F32(1) / F32(math.log(float(PIVOT) + passage_start))


def highlight_doc(
    content: str,
    occurrences: Sequence[Tuple[int, int, str]],
    max_passages: int = 1,
) -> List[Tuple[int, int, float, str]]:
    """occurrences: (startOffset, endOffset, term) for every query-term
    hit in the doc, any order. Returns up to max_passages passages as
    (start, end, score, formatted) sorted by start offset."""
    if not occurrences:
        return []
    n_chars = len(content)
    bounds = sentence_bounds(content)
    ttf: Dict[str, int] = {}
    for _, _, t in occurrences:
        ttf[t] = ttf.get(t, 0) + 1
    weights = {t: _weight(n_chars, f) for t, f in ttf.items()}

    occ = sorted(occurrences)
    # passage index of an offset
    import bisect

    passages: Dict[int, dict] = {}
    # group occurrences by (passage, term) preserving first-occurrence
    # order inside the passage — the reference pq poll order
    for start, end, term in occ:
        k = bisect.bisect_right(bounds, start) - 1
        p = passages.setdefault(
            k, {"start": bounds[k],
                "end": min(bounds[k + 1], n_chars),
                "runs": [], "matches": []})
        p["matches"].append((start, end))
        for r in p["runs"]:
            if r[0] == term:
                r[1] += 1
                break
        else:
            p["runs"].append([term, 1])

    scored = []
    for k in sorted(passages):
        p = passages[k]
        plen = p["end"] - p["start"]
        score = F32(0)
        for term, freq in p["runs"]:
            score = F32(score + weights[term] * _tf(freq, plen))
        score = F32(score * _norm(p["start"]))
        scored.append((float(score), p["start"], p["end"], p["matches"]))

    # min-heap of size n with (score, startOffset) ordering: ties keep
    # the LARGER startOffset (PostingsHighlighter.java passageQueue)
    scored.sort(key=lambda x: (-x[0], -x[1]))
    kept = sorted(scored[:max_passages], key=lambda x: x[1])

    out = []
    for score, start, end, matches in kept:
        # DefaultPassageFormatter.format (:43-60)
        buf = []
        pos = start
        for ms, me in matches:
            if ms > pos:
                buf.append(content[pos:ms])
            if me > pos:  # overlapping terms guard (formatter :74-79)
                buf.append("<b>")
                buf.append(content[max(ms, pos):me])
                buf.append("</b>")
                pos = me
        buf.append(content[pos:end])
        out.append((start, end, score, "".join(buf)))
    return out
