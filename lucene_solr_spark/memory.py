"""MemoryIndex-style percolation: match queries against un-indexed
documents.

Reference: lucene/memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java — a single-document in-RAM index whose headline use
(class javadoc "Prototype for datastream matching") is percolation:
route/alert on each arriving document by running stored queries against
it, without ever touching the main index.

Spark re-expression: instead of building one tiny index per document,
the query is compiled ONCE into a Catalyst boolean Column over the
document's token-array column. A stream of documents is then percolated
with `df.withColumn("matched", pred)` — whole-stage-codegen array ops,
no Python, no shuffle, directly usable inside a Structured Streaming
`readStream -> filter -> writeStream` alerting pipeline. That is the
100 TB shape: percolation cost is a map over arriving batches,
independent of corpus size.

Supported clause kinds: term, phrase (exact AND sloppy), prefix,
wildcard, regexp, term range (same parser surface as
IndexSearcher.search_boolean); matching semantics are BooleanQuery's:
every MUST present, no NOT present, and at least ``mm`` SHOULD
clauses present. Exact phrases compile to a nested-EXISTS walk over a
zipped (token, position) array, so StopFilter holes gate adjacency
exactly like ExactPhraseScorer — pass ``pos_col`` with the analyzer's
positions; without it positions default to the array index (exact
only for hole-free chains). Sloppy phrases ("a b"~n) compile to the
anchored window-existence form of the SloppyPhraseScorer match
condition (minimal adjusted-position window <= slop) — boolean-exact
vs the indexed sloppy path for repeat-free phrases (dual-exec gated
in tests/test_percolate.py); sloppy phrases that REPEAT a term stay
on the indexed path (documented scope cut — the repeat-group walk is
inherently sequential).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from lucene_solr_spark.search.queryparser import parse_query


def _clause_predicate(c, toks_col: Column,
                      pos_col: Optional[Column] = None) -> Column:
    if c.kind == "term":
        return F.array_contains(toks_col, c.terms[0])
    if c.kind == "phrase":
        offs = c.offsets
        if not offs:
            return F.lit(False)
        if c.slop > 0 and len({t for t, _ in offs}) < len(offs):
            raise NotImplementedError(
                "sloppy phrases with REPEATED terms need the scorer's "
                "repeat-group walk (SloppyPhraseScorer.java:150-213); "
                "percolation compiles repeat-free sloppy phrases only "
                "(use the indexed path)")
        if pos_col is None:
            # hole-free fallback: positions = array indexes
            pos_col = F.transform(toks_col, lambda _t, i: i)
        z = F.zip_with(
            toks_col, pos_col,
            lambda t, p: F.struct(t.alias("t"), p.alias("p")))
        if c.slop > 0:
            # SloppyPhraseScorer boolean (freq > 0): a repeat-free
            # sloppy phrase matches iff some choice of one occurrence
            # per clause has adjusted-position window
            # max_j(p_j - d_j) - min_j(p_j - d_j) <= slop (the
            # scorer's minimal-window sweep, search/sloppy.py /
            # SloppyPhraseScorer.java:103-137, finds exactly the
            # minimal such window). Existence form: anchor on the
            # clause whose occurrence achieves the window MIN — for
            # some anchor clause j0 with occurrence at adjusted
            # a = p - d_j0, EVERY clause j has an occurrence with
            # adjusted position in [a, a + slop]. OR over anchors is
            # exact (the true min's clause always works).
            slop = c.slop

            def _in_window(s, dj0, tj, dj):
                def inner(s2):
                    adj = s2["p"] - F.lit(dj)
                    a = s["p"] - F.lit(dj0)
                    return ((s2["t"] == F.lit(tj))
                            & (adj >= a) & (adj <= a + F.lit(slop)))
                return inner

            def _anchored(j0):
                tj0, dj0 = offs[j0]

                def match_at(s):
                    cond = s["t"] == F.lit(tj0)
                    for j, (tj, dj) in enumerate(offs):
                        if j == j0:
                            continue
                        cond = cond & F.exists(
                            z, _in_window(s, dj0, tj, dj))
                    return cond
                return F.exists(z, match_at)

            pred = _anchored(0)
            for j0 in range(1, len(offs)):
                pred = pred | _anchored(j0)
            return pred
        t0 = offs[0][0]

        def _at_offset(s, tj, dj):
            # one-positional-arg lambda factory: pyspark derives the
            # HOF arity from the Python signature, so default-arg
            # capture would mis-declare a 3-arg lambda
            def inner(s2):
                return ((s2["t"] == F.lit(tj))
                        & (s2["p"] == s["p"] + F.lit(dj)))
            return inner

        def match_at(s):
            # ExactPhraseScorer adjacency over analyzer positions:
            # every later phrase term must sit exactly its
            # position-offset after the anchor (stop holes included)
            cond = s["t"] == F.lit(t0)
            for tj, dj in offs[1:]:
                cond = cond & F.exists(z, _at_offset(s, tj, dj))
            return cond

        return F.exists(z, match_at)
    if c.kind == "prefix":
        pat = c.pattern
        return F.exists(toks_col, lambda t: t.startswith(pat))
    if c.kind == "wildcard":
        from lucene_solr_spark.search.executor import _wildcard_regex

        rx = _wildcard_regex(c.pattern)
        return F.exists(toks_col, lambda t: t.rlike(rx))
    if c.kind == "regexp":
        # whole-term anchored, like RegexpQuery (executor parity)
        rx = f"^(?:{c.pattern})$"
        return F.exists(toks_col, lambda t: t.rlike(rx))
    if c.kind == "range":
        lo, hi = c.lo, c.hi

        def in_range(t):
            conds = []
            if lo is not None:
                conds.append(t >= lo if c.include_lo else t > lo)
            if hi is not None:
                conds.append(t <= hi if c.include_hi else t < hi)
            out = conds[0] if conds else F.lit(True)
            for x in conds[1:]:
                out = out & x
            return out

        return F.exists(toks_col, in_range)
    if c.kind == "multi":  # fuzzy — needs the term dict; not stream-able
        raise NotImplementedError(
            "fuzzy clauses need the index term dict; percolation is "
            "index-free by design"
        )
    raise NotImplementedError(
        f"percolation does not support {c.kind!r} clauses "
        "(use the indexed path)"
    )


def percolate_predicate(
    query_text: str,
    toks_col: Column,
    analyzer=None,
    mm: int = 0,
    pos_col: Optional[Column] = None,
) -> Column:
    """Compile ``query_text`` into a boolean Column over an
    array<string> token column (BooleanQuery matching semantics:
    all MUST, no NOT, >= mm SHOULD). ``pos_col`` (array<int>,
    parallel to the tokens) carries the analyzer positions phrase
    clauses match against."""
    clauses = parse_query(query_text, analyzer=analyzer)
    musts = [c for c in clauses if c.occur == "must"]
    shoulds = [c for c in clauses if c.occur == "should"]
    nots = [c for c in clauses if c.occur == "not"]
    pred: Optional[Column] = None

    def conj(a, b):
        return b if a is None else a & b

    for c in musts:
        pred = conj(pred, _clause_predicate(c, toks_col, pos_col))
    for c in nots:
        pred = conj(pred, ~_clause_predicate(c, toks_col, pos_col))
    if shoulds:
        need = mm if (musts or mm > 0) else 1
        if need > 0:
            hits = None
            for c in shoulds:
                h = _clause_predicate(c, toks_col, pos_col).cast("int")
                hits = h if hits is None else hits + h
            pred = conj(pred, hits >= need)
    if pred is None:
        pred = F.lit(False)
    return pred
