"""Payloads: per-position float metadata + payload-scored term queries.

Reference semantics re-expressed:

* `analysis/common/.../payloads/DelimitedPayloadTokenFilter.java`
  (+ `FloatEncoder.java`): a token of the form ``text|payload`` is
  split at the LAST delimiter; the suffix becomes a float payload on
  the token's position. Tokens without the delimiter carry no payload.

* `lucene/core/.../search/payloads/PayloadTermQuery.java:70-150` +
  `AveragePayloadFunction.java` (also Min/Max): per matching doc the
  payloads of every term occurrence are folded
  (avg: float sum / count; docScore=1 when no payloads), and
  ``score() = spanScore * payloadScore`` (PayloadTermQuery.java:146,
  includeSpanScore=true default). For a single-term span the span
  freq equals tf, so spanScore is the ordinary BM25 term score.

Spark shape: Lucene stores payloads in a separate ``.pay`` stream
parallel to positions (Lucene41PostingsFormat payloads file) — here
the payload stream is its own derived table (term, doc_id, tf,
payload_sum, payload_cnt), built by one distributed
split/posexplode/groupBy pass (whole-stage codegen, no Python), and
the payload fold joins the (already-gated) BM25 scores on doc_id.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delimited_payload(token: Column, delimiter: str = "|"):
    """(term, payload) split at the LAST delimiter
    (DelimitedPayloadTokenFilter.java:70-80); payload NULL when the
    token carries none. Returns a struct column — pure Catalyst regex
    ops, codegen-friendly."""
    import re as _re

    d = _re.escape(delimiter)
    has = token.rlike(f"{d}[^{d}]*$")
    term = F.when(has, F.regexp_replace(token, f"{d}[^{d}]*$", "")) \
        .otherwise(token)
    # malformed/empty payloads -> NULL (robustness divergence: the
    # reference's FloatEncoder throws NumberFormatException; a 100 TB
    # pipeline wants the row, not the abort)
    pay = F.when(
        has,
        F.regexp_extract(token, f"{d}([^{d}]*)$", 1).try_cast("float"))
    return F.struct(term.alias("term"), pay.alias("payload"))


def payload_table(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", delimiter: str = "|"
                  ) -> DataFrame:
    """Distributed payload-stream extraction from delimited text:
    (doc_id, term, tf, payload_sum double, payload_cnt long). One
    narrow pass: split -> posexplode -> last-delimiter split ->
    groupBy(doc, term). Payload values are exact in double (f32 inputs
    widen losslessly), so the fold order is immaterial."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    parsed = toks.select(
        "doc_id",
        delimited_payload(F.col("tok"), delimiter).alias("tp"),
    ).select("doc_id", F.col("tp.term").alias("term"),
             F.col("tp.payload").alias("payload"))
    return parsed.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.sum(F.col("payload").cast("double")).alias("payload_sum"),
        F.count("payload").alias("payload_cnt"),
        F.min("payload").alias("payload_min"),
        F.max("payload").alias("payload_max"),
    )


def payload_term_query(searcher, payloads: DataFrame, term: str,
                       fn: str = "avg", include_span_score: bool = True,
                       k: Optional[int] = 10) -> DataFrame:
    """PayloadTermQuery: BM25 span score x folded payload
    (PayloadTermQuery.java:146; AveragePayloadFunction docScore =
    payload_sum/cnt, Min/MaxPayloadFunction min/max; docScore=1 when
    the doc has no payloads). All combination steps f32."""
    span = searcher.search(term, k=None)  # (doc_id, score f32), gated
    pay = payloads.filter(F.col("term") == term).select(
        "doc_id", "payload_sum", "payload_cnt", "payload_min",
        "payload_max")
    if fn == "avg":
        # payload_sum is exact in double (f32 payloads widen
        # losslessly), so double division + f32 cast equals the
        # reference's float division up to the documented 2^-29
        # double-rounding hazard
        folded = (F.col("payload_sum")
                  / F.col("payload_cnt").cast("double")).cast("float")
    elif fn == "min":   # MinPayloadFunction.java
        folded = F.col("payload_min").cast("float")
    elif fn == "max":   # MaxPayloadFunction.java
        folded = F.col("payload_max").cast("float")
    else:
        raise ValueError(fn)
    pscore = F.when(
        F.col("payload_cnt").isNull() | (F.col("payload_cnt") == 0),
        F.lit(1.0).cast("float"),
    ).otherwise(folded)
    joined = span.join(pay, "doc_id", "left")
    score = (
        (F.col("score") * F.coalesce(pscore, F.lit(1.0).cast("float")))
        .cast("float") if include_span_score
        else F.coalesce(pscore, F.lit(1.0).cast("float"))
    )
    out = joined.select("doc_id", score.alias("score")) \
        .orderBy(F.desc("score"), F.asc("doc_id"))
    return out if k is None else out.limit(k)
