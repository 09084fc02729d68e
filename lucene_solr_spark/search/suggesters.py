"""AnalyzingSuggester (lucene/suggest/src/java/org/apache/lucene/
search/suggest/analyzing/AnalyzingSuggester.java): dictionary-based
completion where the LOOKUP KEY is the ANALYZED form of each surface
string but the SURFACE form is what comes back — "the ghost of
christmas" completes from the query "ghost" when the chain drops
stopwords (class javadoc :66-90).

Re-expression: the reference compiles (analyzed-form, weight, surface)
triples into an FST and intersects it with the analyzed query's
automaton. Relationally the dictionary is a DataFrame
(surface, weight); the analyzed key is one Arrow-batched projection,
the lookup is a pushdown-able ``startswith`` on the key column, and
the FST's cost order is ``ORDER BY weight DESC`` with exactFirst
(:112-118) reserving the top slots for exact analyzed matches.
Scale: the dictionary scan prunes on the key prefix; no driver-side
structure, so a billion-entry dictionary is just a sorted/bucketed
table.

Fidelity notes (documented deltas): preserveSep inserts SEP_LABEL
0x1f between analyzed tokens (:124,:139-143) — position holes collapse
to a single separator; graph analyzers (multiple analyzed paths per
surface) are out of scope like everywhere else in this engine (one
chain = one path); maxSurfaceFormsPerAnalyzedForm / maxGraphExpansions
are FST-size controls with no relational counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from lucene_solr_spark.functions.analysis import get_analyzer

# AnalyzingSuggester.SEP_LABEL (:124) — token separator in the
# analyzed key when preserveSep (the default) is on
SEP_LABEL = "\x1f"


def analyzed_key_column(analyzer: str = "standard",
                        preserve_sep: bool = True):
    """Returns a function Column->Column producing the analyzed key
    (Arrow-batched; the chain runs in pandas like every analysis
    crossing in this engine)."""
    spec = get_analyzer(analyzer)
    sep = SEP_LABEL if preserve_sep else ""

    @pandas_udf("string")
    def _key(surfaces):
        return surfaces.map(
            lambda s: sep.join(spec.analyze(s or "")))

    return _key


def analyzing_suggest(
    dictionary: DataFrame,
    query: str,
    n: int = 5,
    analyzer: str = "standard",
    exact_first: bool = True,
    preserve_sep: bool = True,
) -> DataFrame:
    """Top-n completions for ``query`` from ``dictionary`` (columns
    ``surface``, ``weight``). Order: exact analyzed matches first when
    exactFirst (AnalyzingSuggester.java:112-118,:560-575), then weight
    desc (FST cost order), surface asc as the deterministic tie.
    Surfaces whose analyzed form is empty (all stopwords) are
    unreachable, mirroring the empty-path skip."""
    spec = get_analyzer(analyzer)
    sep = SEP_LABEL if preserve_sep else ""
    qkey = sep.join(spec.analyze(query))
    key = analyzed_key_column(analyzer, preserve_sep)(F.col("surface"))
    keyed = (
        dictionary.withColumn("_key", key)
        .filter(F.length("_key") > 0)
        .filter(F.col("_key").startswith(qkey))
    )
    exact = F.when(F.col("_key") == qkey, 1).otherwise(0) \
        if exact_first else F.lit(0)
    return (
        keyed.select(
            "surface", F.col("weight").cast("long").alias("weight"),
            exact.alias("_exact"),
        )
        .orderBy(F.desc("_exact"), F.desc("weight"), F.asc("surface"))
        .drop("_exact")
        .limit(n)
    )
