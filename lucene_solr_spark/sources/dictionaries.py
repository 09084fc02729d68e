"""Spellchecker / suggester dictionary sources (lucene/suggest/src/
java/org/apache/lucene/search/spell/ and .../suggest/):

- LuceneDictionary (spell/LuceneDictionary.java): every term of a
  field — here the sorted term dictionary itself.
- HighFrequencyDictionary (spell/HighFrequencyDictionary.java): terms
  whose docFreq >= (int)(thresh * (float)numDocs) (:76-81 — the f32
  multiply-then-truncate kept).
- PlainTextDictionary (spell/PlainTextDictionary.java): one word per
  line.
- FileDictionary (suggest/FileDictionary.java:76-100): TAB-separated
  word[\\tweight] lines; the weight parses as long, falls back to
  (long) of the double parse (truncation toward zero), and defaults
  to 1 when absent.

All four return DataFrames (term[, weight]) that feed the relational
spellcheck/completion operators the way the reference feeds
SpellChecker.indexDictionary / Lookup.build — the dictionary IS a
table here, so "indexing the dictionary" is a no-op."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lucene_dictionary(term_stats: DataFrame) -> DataFrame:
    """LuceneDictionary: the field's whole term dictionary, term
    order (the reference walks TermsEnum — already sorted here)."""
    return term_stats.select("term").orderBy("term")


def high_frequency_dictionary(term_stats: DataFrame, num_docs: int,
                              thresh: float) -> DataFrame:
    """HighFrequencyDictionary: terms in >= thresh fraction of docs;
    minNumDocs = (int)(thresh * (float)numDocs) exactly as the
    reference truncates (:76). Pushdown-able df predicate over the
    sorted term_stats scan."""
    import numpy as np

    min_num_docs = int(np.float32(thresh) * np.float32(num_docs))
    return (term_stats.filter(F.col("df") >= min_num_docs)
            .select("term", "df").orderBy("term"))


def plain_text_dictionary(lines: DataFrame,
                          col: str = "line") -> DataFrame:
    """PlainTextDictionary: one word per line, no weights."""
    return (lines.select(F.col(col).alias("term"))
            .filter(F.col("term") != ""))


def file_dictionary(lines: DataFrame, col: str = "line") -> DataFrame:
    """FileDictionary line parse (FileDictionary.java:82-95): split on
    TAB; weight = Long.parseLong(f1), falling back to
    (long) Double.parseDouble(f1) — truncation toward zero, which is
    Spark's double->long cast — and 1 when the line has no TAB."""
    f = F.split(F.col(col), "\t")
    weight = F.when(
        F.size(f) > 1,
        F.coalesce(
            f.getItem(1).try_cast("long"),
            f.getItem(1).try_cast("double").cast("long"),
        ),
    ).otherwise(F.lit(1).cast("long"))
    return lines.select(
        f.getItem(0).alias("term"), weight.alias("weight"))
