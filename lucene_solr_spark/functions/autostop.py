"""QueryAutoStopWordAnalyzer re-expression.

Reference: ``analysis/common/.../query/QueryAutoStopWordAnalyzer.java``
— wraps another analyzer and ADDS as stopwords every indexed term
whose document frequency exceeds a threshold, either an absolute
``maxDocFreq`` (:104-117) or ``maxPercentDocs * numDocs``
(:119-134, float product; ``defaultMaxDocFreqPercent = 0.4f``).
The stop set is computed once from an IndexReader per field
(TermsEnum walk, :148-160); query-time analysis then drops those
terms like a StopFilter (position holes preserved, :186-192).

Spark-first: the TermsEnum walk is one aggregation over the per-doc
distinct term table — ``df > threshold`` — and the wrapped analyzer
is the engine's composable post-filter slot.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_PERCENT = 0.4  # QueryAutoStopWordAnalyzer.java:64


def auto_stop_words_df(doc_terms: DataFrame, num_docs: int,
                       max_percent: float = DEFAULT_MAX_PERCENT,
                       max_doc_freq: int | None = None) -> DataFrame:
    """(doc_id, term) -> (term, df) rows whose df exceeds the
    threshold. Threshold per reference: df > maxPercentDocs*numDocs
    (float product) or df > maxDocFreq when given."""
    thr = (float(max_doc_freq) if max_doc_freq is not None
           else float(max_percent) * num_docs)
    df = (doc_terms.dropDuplicates(["doc_id", "term"])
          .groupBy("term")
          .agg(F.count(F.lit(1)).cast("long").alias("df")))
    return df.filter(F.col("df") > F.lit(thr))


def auto_stop_post(stop_terms):
    """Query-side stream filter: drop the auto stop set, keep holes
    (StopFilter semantics, QueryAutoStopWordAnalyzer.java:186-192)."""
    stop = frozenset(stop_terms)

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        return [(t, p) for t, p in tp if t not in stop]

    return post
