"""Training-data hygiene operators (task addendum; no reference-repo
counterpart — these belong to the large-scale LLM pipeline surface
alongside dedup/quality/sampling in driver_entry.py):

- PII redaction: typed regex scrub (email / SSN / US-phone / IPv4) as
  a chain of JVM-side ``regexp_replace`` calls — whole-stage codegen,
  no Python in the row path; per-type match counts via
  ``regexp_count``. Patterns are written in the common
  Java-regex/RE2 subset so the DuckDB oracle runs them verbatim.
  Redaction order is fixed (email, SSN, phone, IPv4) so earlier
  replacements cannot create or destroy later matches.

- Eval-set decontamination: flag training docs sharing any N-token
  shingle with an eval/benchmark set (the standard n-gram-collision
  contamination check used when training corpora must exclude test
  data). Shingles are built JVM-side (``transform`` over a
  ``sequence`` of start offsets + ``slice``/``concat_ws``), the
  collision test is one distinct shingle equi-join — at scale this is
  a broadcast join when the eval set is small (the usual case:
  benchmarks are tiny next to a 100 TB corpus) and a hash join
  otherwise; Catalyst/AQE picks per stats.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ORDER IS THE CONTRACT
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(col: Column) -> Column:
    """The redacted text: regexp_replace chain in PII_PATTERNS order."""
    out = col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> List[Column]:
    """Per-type match counts on the ORIGINAL text (each aliased
    ``n_<type>``). Counted before redaction so types are independent
    of the replacement order."""
    return [
        F.regexp_count(col, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _repl in PII_PATTERNS
    ]


def shingle_column(tokens: Column, n: int) -> Column:
    """All n-token shingles of a token array, JVM-side: empty when the
    doc has fewer than n tokens."""
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Contamination report: for each training doc, the number of
    DISTINCT n-token shingles it shares with the eval set (docs with
    zero shared shingles are omitted). Join keys are the distinct
    shingle strings; swap in a hash (xxhash64) at extreme scale if
    shingle strings dominate shuffle bytes."""
    def grams(df):
        toks = F.split(F.col(text_col), " ")
        return (
            df.select("doc_id",
                      F.explode(shingle_column(toks, n)).alias("gram"))
            .distinct()
        )

    tg = grams(train)
    eg = grams(eval_set).select("gram").distinct()
    return (
        tg.join(eg, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .orderBy("doc_id")
    )
