"""Function queries: the ValueSource family as native Column
expressions (SURVEY.md section 2.9 — all 47 reference ValueSource
classes are per-doc scalars; lucene/queries/src/java/org/apache/lucene/
queries/function/valuesource/*.java). No UDFs: every function compiles
to whole-stage-codegen Catalyst expressions.

Two surfaces:

1. ``VALUE_SOURCES``: name -> Column builder for the arithmetic / logic
   ValueSources (SumFloatFunction, ProductFloatFunction,
   DivFloatFunction, PowFloatFunction, Max/MinFloatFunction,
   LinearFloatFunction, ReciprocalFloatFunction, ScaleFloatFunction,
   IfFunction — file names cited above; each is a one-line Column
   combinator here because Catalyst already IS a function-expression
   engine).

2. ``boosted_search``: BoostedQuery/FunctionQuery composition
   (lucene/queries/.../function/BoostedQuery.java: score =
   subQuery.score(doc) * valueSource(doc)) — BM25 hits joined with doc
   attributes, final score = bm25 * f(doc columns), computed in double
   (Catalyst numeric) with the product order preserved.

Index-stats ValueSources (IDFValueSource, TFValueSource,
DocFreqValueSource, NormValueSource, MaxDoc/NumDocsValueSource...) are
served by the engine's stats tables: ``searcher.term_stats()``,
``searcher.collection_stats()``, ``searcher.doc_stats()`` — join them
like any dimension table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["VALUE_SOURCES", "boosted_search", "scale_float",
           "custom_score_search", "function_range"]


def scale_float(col: Column, min_v: float, max_v: float,
                lo: float, hi: float) -> Column:
    """ScaleFloatFunction.java: linearly map [min_v, max_v] -> [lo, hi].
    (The reference computes min/max over the index in a pre-pass; pass
    them in from an agg.)"""
    span = max_v - min_v
    return F.when(
        F.lit(span) == 0, F.lit(lo)
    ).otherwise((col - min_v) / F.lit(span) * (hi - lo) + lo)


VALUE_SOURCES = {
    # arithmetic (SumFloatFunction.java, ProductFloatFunction.java, ...)
    "sum": lambda *cols: sum(cols[1:], cols[0]),
    "product": lambda *cols: __import__("functools").reduce(
        lambda a, b: a * b, cols
    ),
    "div": lambda a, b: a / b,
    "pow": lambda a, b: F.pow(a, b),
    "max": lambda *cols: F.greatest(*cols),
    "min": lambda *cols: F.least(*cols),
    # LinearFloatFunction.java: m*x + c
    "linear": lambda x, m, c: x * F.lit(m) + F.lit(c),
    # ReciprocalFloatFunction.java: a / (m*x + b)
    "recip": lambda x, m, a, b: F.lit(a) / (F.lit(m) * x + F.lit(b)),
    "scale": scale_float,
    # RangeMapFloatFunction.java: val in [min,max] -> target, else
    # default (or the value itself when no default is given)
    "rangemap": lambda x, mn, mx, target, dflt=None: F.when(
        (x >= F.lit(mn)) & (x <= F.lit(mx)), F.lit(target)
    ).otherwise(x if dflt is None else F.lit(dflt)),
    # logic (IfFunction.java, DefFunction.java, SimpleBoolFunction /
    # MultiBoolFunction subclasses NotFunction/AndFunction/OrFunction)
    "if": lambda c, a, b: F.when(c, a).otherwise(b),
    "def": lambda a, b: F.coalesce(a, b),
    "and": lambda *cs: __import__("functools").reduce(
        lambda a, b: a & b, cs
    ),
    "or": lambda *cs: __import__("functools").reduce(
        lambda a, b: a | b, cs
    ),
    "not": lambda c: ~c,
    # FieldValueFilter-as-value / ExistsValueSource
    "exists": lambda x: x.isNotNull(),
    # common field transforms (Solr function surface)
    "log": lambda x: F.log(x),
    "sqrt": lambda x: F.sqrt(x),
    "abs": lambda x: F.abs(x),
}


def ord_source(searcher, field: str, reverse: bool = False) -> DataFrame:
    """OrdFieldSource / ReverseOrdFieldSource (lucene/queries/.../
    valuesource/OrdFieldSource.java, ReverseOrdFieldSource.java): the
    1-based ordinal of the doc's field value among the index-sorted
    distinct values (rord = ordinal from the top).

    Scale shape: dense_rank is computed over the DISTINCT value table
    only (cardinality = vocabulary of the field, the reference's
    SortedDocValues ordinal dictionary), then broadcast-joined back to
    the fact side — a global window over the full docs table would
    single-partition-sort the corpus at 100 TB for the same answer."""
    from pyspark.sql import Window

    order = F.desc(field) if reverse else F.asc(field)
    vals = searcher._docs.select(field).distinct()
    ordmap = vals.withColumn(
        "ord", F.dense_rank().over(Window.orderBy(order)))
    return searcher._docs.select("doc_id", field).join(
        F.broadcast(ordmap), field
    ).select("doc_id", "ord")


def query_value_source(searcher, query_text: str,
                       default: float = 0.0, **kw) -> DataFrame:
    """QueryValueSource (valuesource/QueryValueSource.java): the score
    of an arbitrary query as a per-doc value; non-matching docs get
    ``default``. Join with a coalesce — the relational defVal."""
    hits = searcher.search(query_text, k=None, **kw)
    return searcher._docs.select("doc_id").join(
        hits, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("score").cast("double"),
                   F.lit(float(default))).alias("qv"),
    )


def term_freq_source(searcher, term: str) -> DataFrame:
    """TFValueSource / TermFreqValueSource (valuesource/
    TermFreqValueSource.java): per-doc raw term frequency of one term
    — decoded from the term's postings, 0 docs omitted (join with
    coalesce for defaults)."""
    return searcher.term_freqs(term)


def index_stats_sources(searcher) -> dict:
    """The index-stats-as-value family (valuesource/MaxDocValueSource,
    NumDocsValueSource, SumTotalTermFreqValueSource,
    IDFValueSource, DocFreqValueSource, TotalTermFreqValueSource):
    collection-level values are driver-side scalars (they are constant
    per index), per-term values are tiny lookups against the sorted
    term_stats table. Use the scalars as ``F.lit(...)`` in Column math.
    """

    def _df_cf(term: str):
        dfs = searcher._lookup_dfs([term])
        cfs = searcher._lookup_cfs([term])
        return dfs.get(term, 0), cfs.get(term, 0)

    from lucene_solr_spark.functions.bm25 import idf as _bm25_idf

    return {
        "maxdoc": lambda: searcher.max_doc,
        # NumDocsValueSource: maxDoc - numDeletedDocs (live docs)
        "numdocs": lambda: searcher.doc_stats().count(),
        "sumtotaltermfreq": lambda: searcher.sum_ttf,
        "docfreq": lambda term: _df_cf(term)[0],
        "totaltermfreq": lambda term: _df_cf(term)[1],
        # IDFValueSource.java: the similarity's idf for the term —
        # BM25 form (the engine default)
        "idf": lambda term: float(_bm25_idf(
            _df_cf(term)[0], searcher.max_doc
        )),
    }


def norm_source(searcher) -> DataFrame:
    """NormValueSource.java: the decoded norm as a per-doc value —
    served from the engine's doc_stats surface (doc_id, norm_byte)."""
    return searcher.doc_stats().select("doc_id", "norm_byte")


def boosted_search(
    searcher,
    query_text: str,
    boost: Column,
    doc_attrs: DataFrame,
    k: int = 10,
    **search_kw,
) -> DataFrame:
    """BoostedQuery: BM25 top-k where final score = bm25_score *
    boost(doc attributes). The boost must be non-negative and bounded
    for the cut below to be exact, so the full (k=None) result set is
    re-ranked — at scale, pre-filter or pass a per-group-safe boost.

    doc_attrs: DataFrame keyed by doc_id carrying the columns ``boost``
    references. Returns (doc_id, score) ordered score desc, doc asc.
    """
    hits = searcher.search(query_text, k=None, **search_kw)
    return (
        hits.join(doc_attrs, "doc_id")
        .withColumn("score", F.col("score").cast("double") * boost)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def custom_score_search(
    searcher,
    query_text: str,
    val_sources,
    doc_attrs: DataFrame,
    k: int = 10,
    boost: float = 1.0,
    **search_kw,
) -> DataFrame:
    """CustomScoreQuery with the DEFAULT CustomScoreProvider
    (lucene/queries/src/java/org/apache/lucene/queries/
    CustomScoreQuery.java + CustomScoreProvider.java:74-92): final
    score = qWeight * customScore(subQueryScore, valSrcScores) where
    the default provider multiplies the sub-query score by EVERY
    FunctionQuery value in order (float32 per step, :81-86; one
    valSrc: one f32 multiply, :108-110; zero valSrcs: sub score
    unchanged) and qWeight = topLevelBoost * getBoost()
    (CustomScoreQuery.java:233, queryNorm = 1 under BM25) applied LAST
    (CustomScorer.score() :329-333).

    ``val_sources``: Column or sequence of Columns over ``doc_attrs``
    (each is one FunctionQuery; FunctionQuery.AllScorer.score() returns
    the raw f32 value when its own boost is 1). Non-matching docs of
    the sub query never score — CustomScorer iterates the sub scorer.
    """
    import numpy as np

    if isinstance(val_sources, Column):
        val_sources = [val_sources]
    hits = searcher.search(query_text, k=None, **search_kw)
    score = F.col("score").cast("float")
    for v in val_sources:  # f32 product, one rounding per step (:81-86)
        score = (score * v.cast("float")).cast("float")
    qw = float(np.float32(boost))
    if qw != 1.0:
        score = (F.lit(qw).cast("float") * score).cast("float")
    return (
        hits.join(doc_attrs, "doc_id")
        .withColumn("score", score)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def function_range(
    doc_attrs: DataFrame,
    value: Column,
    lower=None,
    upper=None,
    include_lower: bool = True,
    include_upper: bool = True,
) -> DataFrame:
    """Solr ``{!frange}`` — FunctionRangeQuery over a
    ValueSourceRangeFilter (solr/core/src/java/org/apache/solr/search/
    FunctionRangeQuery.java; solr/.../search/function/
    ValueSourceRangeFilter.java; the match test is
    ValueSourceScorer.matches via FunctionValues.getRangeScorer —
    float32 comparisons against the parsed bounds). Constant-score doc
    set: returns matching doc_ids (the PostFilter/fq shape; scores in
    Solr are the query boost, carried by the caller if composed).

    Open bounds (None) match Solr's optional l/u params. The value
    column is cast to float BEFORE comparison, mirroring
    FunctionValues.floatVal."""
    import numpy as np

    v = value.cast("float")
    cond = None
    if lower is not None:
        lo = F.lit(float(np.float32(lower))).cast("float")
        c = (v >= lo) if include_lower else (v > lo)
        cond = c
    if upper is not None:
        hi = F.lit(float(np.float32(upper))).cast("float")
        c = (v <= hi) if include_upper else (v < hi)
        cond = c if cond is None else (cond & c)
    out = doc_attrs if cond is None else doc_attrs.where(cond)
    return out.select("doc_id").orderBy("doc_id")


class FunctionContext:
    """FunctionQParser index-context bindings (solr/search/
    ValueSourceParser.java registrations that need searcher state):
    termfreq/tf/docfreq/totaltermfreq(ttf)/idf/norm/maxdoc/numdocs/
    sumtotaltermfreq(sttf)/scale/literal/vector/top wired into
    parse_function_query via ``extra``.

    Per-doc sources (termfreq, tf, norm, scale outputs) become columns
    joined onto the base doc frame lazily: each call registers a
    (frame, column, default) join and returns the Column; ``apply``
    materializes them. Constant sources (docfreq, idf, maxdoc, ...)
    resolve to literals at parse time — exactly the reference split
    between ConstIntDocValues and per-doc FunctionValues.

    Reference math kept:
    - tf(f,t)   = f32(sqrt(freq)) — TFValueSource.java:145-150 via
      ClassicSimilarity.tf (DefaultSimilarity.java)
    - idf(f,t)  = f32(ln(maxDoc/(df+1)) + 1) — IDFValueSource.java:40-47
      via ClassicSimilarity.idf; df of an absent term is 0
    - norm(f)   = SmallFloat.byte315ToFloat(norm_byte)
      (NormValueSource.java:55-62, decodeNormValue)
    - scale(x,lo,hi) — ScaleFloatFunction.java: min/max pre-pass over
      the doc frame skipping Inf/NaN (exponent-all-ones rule :55-60),
      empty -> min=max=0, span==0 -> scale=0, then the f32 chain
      (v - minSource) * scale + lo with scale = f32((hi-lo)/span).
      The reference pre-pass walks 0..maxDoc INCLUDING deleted docs;
      ours scans the base frame the caller passes (live docs when the
      caller passes live docs) — at 100 TB a full-corpus two-pass
      either way, one extra agg job + broadcast of one row.
    """

    def __init__(self, searcher, field: str = "text"):
        import math as _math

        import numpy as _np

        self.searcher = searcher
        self.field = field
        self._joins = []    # (DataFrame[doc_id, name], name, default)
        self._scales = []   # (Column, lo Column, hi Column, out name)
        self._n = 0
        self._numdocs = None
        s = searcher

        def _chk(f):
            if f != self.field:
                from lucene_solr_spark.search.queryparser import (
                    QueryParseError)
                raise QueryParseError(
                    f"unknown field {f!r} (index field: {self.field!r})")

        def _df_of(term):
            return s._lookup_dfs([term]).get(term, 0)

        def _cf_of(term):
            return s._lookup_cfs([term]).get(term, 0)

        def _termfreq_col(term):
            name = f"_vs_tf{self._n}"
            self._n += 1
            self._joins.append(
                (s.term_freqs(term).withColumnRenamed("tf", name),
                 name, 0))
            return F.col(name)

        def termfreq(f, t):
            _chk(f)
            return _termfreq_col(t).cast("long")

        def tf(f, t):
            _chk(f)
            return F.sqrt(_termfreq_col(t).cast("double")).cast("float")

        def idf(f, t):
            _chk(f)
            v = _np.float32(
                _math.log(s.max_doc / float(_df_of(t) + 1)) + 1.0)
            return F.lit(float(v)).cast("float")

        def docfreq(f, t):
            _chk(f)
            return F.lit(int(_df_of(t))).cast("long")

        def ttf(f, t):
            _chk(f)
            return F.lit(int(_cf_of(t))).cast("long")

        def sttf(f):
            _chk(f)
            return F.lit(int(s.sum_ttf)).cast("long")

        def norm(f):
            _chk(f)
            name = f"_vs_nb{self._n}"
            self._n += 1
            self._joins.append(
                (s.doc_stats().select(
                    "doc_id", F.col("norm_byte").alias(name)),
                 name, 0))
            nb = F.col(name)
            # SmallFloat.byte315ToFloat: 0 -> 0f, else the 3-mantissa-
            # bit float rebuilt arithmetically (exact: the mantissa
            # fits double)
            return F.when(nb == 0, F.lit(0.0)).otherwise(
                F.pow(F.lit(2.0), F.floor(nb / 4) - 31)
                * (1 + (nb % 4) / F.lit(4.0))
            ).cast("float")

        def maxdoc():
            return F.lit(int(s.max_doc)).cast("long")

        def numdocs():
            if self._numdocs is None:
                self._numdocs = int(s.match_all_docs().count())
            return F.lit(self._numdocs).cast("long")

        def scale(x, lo, hi):
            name = f"_vs_scale{self._n}"
            self._n += 1
            self._scales.append(
                (x, lo.cast("float"), hi.cast("float"), name))
            return F.col(name)

        def literal(v):
            return F.lit(v)

        def vector(*cols):
            return F.array(*cols)

        def top(x):
            return x   # top(vs) is a no-op (ValueSourceParser:134-141)

        # these take field/term names (FunctionQParser parseArg /
        # parseTerm), not value-source expressions
        for fn in (termfreq, tf, idf, docfreq, ttf, sttf, norm, literal):
            fn.raw_args = True
        self.extra = {
            "termfreq": termfreq, "tf": tf, "idf": idf,
            "docfreq": docfreq, "totaltermfreq": ttf, "ttf": ttf,
            "sumtotaltermfreq": sttf, "sttf": sttf, "norm": norm,
            "maxdoc": maxdoc, "numdocs": numdocs, "scale": scale,
            "literal": literal, "vector": vector, "top": top,
        }

    def apply(self, base: DataFrame) -> DataFrame:
        """Materialize the registered per-doc sources onto ``base``
        (must carry doc_id): left joins with defaults, then the scale
        pre-pass aggs (one broadcast row each)."""
        df = base
        for frame, name, default in self._joins:
            df = df.join(frame, "doc_id", "left").withColumn(
                name, F.coalesce(F.col(name), F.lit(default)))
        for x, lo, hi, name in self._scales:
            v = x.cast("float")
            finite = ~(F.isnan(v) | (F.abs(v) == float("inf")))
            agg = df.select(
                F.min(F.when(finite, v)).alias("_vs_mn"),
                F.max(F.when(finite, v)).alias("_vs_mx"))
            df = df.crossJoin(F.broadcast(agg))
            mn = F.coalesce(F.col("_vs_mn"), F.lit(0.0)).cast("float")
            mx = F.coalesce(F.col("_vs_mx"), F.lit(0.0)).cast("float")
            span = (mx - mn).cast("float")
            sc = F.when(span == 0, F.lit(0.0).cast("float")).otherwise(
                ((hi - lo).cast("float") / span).cast("float"))
            df = df.withColumn(
                name,
                (((v - mn).cast("float") * sc).cast("float") + lo)
                .cast("float")
            ).drop("_vs_mn", "_vs_mx")
        return df
