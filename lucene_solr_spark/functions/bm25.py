"""Bit-compatible BM25 scoring kernels (float32), vectorized with numpy.

Reference semantics (lucene/core/src/java/org/apache/lucene/search/
similarities/BM25Similarity.java):
  - idf           :64-67   (float) ln(1 + (maxDoc - df + 0.5)/(df + 0.5)),
                            double math, single cast to float
  - multi-term idf :185-198 plain float32 SUM of per-term idfs
  - avgdl          :82-89   (float)(sumTotalTermFreq / (double) maxDoc)
  - norm cache     :206-210 cache[i] = k1*((1-b) + b*decode(i)/avgdl), float
  - score          :220-238 weightValue * freq / (freq + cache[normByte]),
                            weightValue = weight * (k1+1); weight = idf
                            (queryNorm is a no-op for BM25,
                            Similarity.java:139-141)
Conjunction accumulation order is normative: float32 sum over clauses in
ascending-cost (df) order (ConjunctionScorer.java:47-54,104-111); coord=1
for BM25 (Similarity.java:112-124). Disjunction accumulates in DOUBLE then
casts to float (DisjunctionSumScorer.java — `double score` field).
"""

from __future__ import annotations

import math

import numpy as np

from lucene_solr_spark.constants import B, K1
from lucene_solr_spark.functions.smallfloat import NORM_TABLE

__all__ = ["idf", "avgdl", "norm_cache", "score_block", "BM25Weight"]

F32 = np.float32


def idf(df: int, max_doc: int) -> np.float32:
    """BM25Similarity.idf (BM25Similarity.java:64-67)."""
    return F32(math.log(1.0 + (max_doc - df + 0.5) / (df + 0.5)))


def avgdl(sum_total_term_freq: int, max_doc: int) -> np.float32:
    """BM25Similarity.avgFieldLength (BM25Similarity.java:82-89)."""
    if sum_total_term_freq <= 0:
        return F32(1.0)
    return F32(sum_total_term_freq / float(max_doc))


def norm_cache(avg_dl: np.float32, k1: float = K1, b: float = B) -> np.ndarray:
    """256-entry freq-independent cache (BM25Similarity.java:206-210).

    cache[i] = k1 * ((1 - b) + b * decodeNorm(i) / avgdl), all float32.
    decodeNorm(i) = NORM_TABLE[i] = quantized field length.
    """
    k1f, bf = F32(k1), F32(b)
    one = F32(1.0)
    return (k1f * ((one - bf) + bf * NORM_TABLE / F32(avg_dl))).astype(np.float32)


def score_block(
    tfs: np.ndarray,
    norm_bytes: np.ndarray,
    weight: np.float32,
    cache: np.ndarray,
    k1: float = K1,
) -> np.ndarray:
    """Vectorized BM25DocScorer.score (BM25Similarity.java:233-238).

    tfs: int array of raw term freqs; norm_bytes: uint8 norm per doc.
    Returns float32 scores: weightValue*tf/(tf + cache[norm]).
    """
    weight_value = F32(weight) * F32(K1_PLUS_1 if k1 == K1 else k1 + 1)
    freq = tfs.astype(np.float32)
    norm = cache[norm_bytes.astype(np.int64)]
    return (weight_value * freq / (freq + norm)).astype(np.float32)


K1_PLUS_1 = F32(F32(K1) + F32(1))


class BM25Weight:
    """Per-term query weight: idf + norm cache, computed once per query
    from global collection stats (TermWeight ctor, TermQuery.java:50-59;
    BM25Stats, BM25Similarity.java:264-294). boost=1 => weight == idf."""

    __slots__ = ("term", "df", "idf", "weight", "cache", "max_score_hint")

    def __init__(self, term: str, df: int, max_doc: int, cache: np.ndarray):
        self.term = term
        self.df = int(df)
        self.idf = idf(df, max_doc)
        self.weight = self.idf  # boosts fixed at 1 in this surface
        self.cache = cache
        # absolute upper bound on any score from this term:
        # weightValue * tf/(tf+norm) < weightValue (monotone in tf)
        self.max_score_hint = F32(self.weight * K1_PLUS_1)
