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


def payload_positions(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", delimiter: str = "|"
                      ) -> DataFrame:
    """Position-level payload stream (doc_id, pos, term, payload):
    the un-aggregated .pay-file analogue ``payload_table`` folds.
    ``pos`` is the whitespace token index — the position space the
    delimited-payload field defines."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    return toks.select(
        "doc_id", "pos",
        delimited_payload(F.col("tok"), delimiter).alias("tp"),
    ).select("doc_id", "pos", F.col("tp.term").alias("term"),
             F.col("tp.payload").alias("payload"))


def payload_near_query(searcher, positions: DataFrame, term_a: str,
                       term_b: str, k: Optional[int] = 10,
                       max_matches: int = 4096) -> DataFrame:
    """PayloadNearQuery, adjacent-ordered 2-clause shape
    (search/payloads/PayloadNearQuery.java): SpanNear(a, b, slop=0,
    ordered) where every match contributes

      - freq += sloppyFreq(matchLength = end-start = 2) = f32(1/3)
        (PayloadNearQuery.java setFreqCurrentDoc; BM25Similarity.java:
        68-71, computeSlopFactor :246-247), accumulated STEPWISE in
        float32 — reproduced by a driver-built k->freq fold table
        broadcast-joined on the per-doc match count (with slop=0 the
        greedy NearSpansOrdered enumeration equals the adjacent-pair
        set, so the count is well-defined relationally);
      - both positions' payloads into AveragePayloadFunction
        (payloadScore/payloadsSeen, AveragePayloadFunction.java:30-37;
        payload factor = the decoded float payload, the PayloadHelper
        convention payload_term_query also uses).

    score = f32(spanScore * payloadAvg) with spanScore the standard
    BM25 chain over the fractional freq (weight = f32 idf-sum of both
    clause terms, phrase-style).

    Scale shape: two pushed-down position scans, one equi-join on
    (doc_id, adjacent pos), one hash agg, two broadcast joins (fold
    table, norm bytes). General n-clause/slop>0 shapes remain on the
    spans kernel (search_spans) — this is the payload-scored fast
    path."""
    import numpy as np

    from lucene_solr_spark.functions.bm25 import F32, K1_PLUS_1, idf

    a = positions.filter(F.col("term") == term_a).select(
        "doc_id", F.col("pos").alias("pa"),
        F.col("payload").alias("pay_a"))
    b = positions.filter(F.col("term") == term_b).select(
        "doc_id", F.col("pos").alias("pb"),
        F.col("payload").alias("pay_b"))
    m = a.join(b, "doc_id").filter(F.col("pb") == F.col("pa") + 1)
    agg = m.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum((F.col("pay_a") + F.col("pay_b")).cast("double"))
        .alias("psum"),
        (2 * F.count("pay_a")).alias("cnt"),
    )

    # k -> stepwise-f32 freq fold (k copies of f32(1/3))
    inc = F32(F32(1.0) / F32(3.0))
    acc = F32(0.0)
    folds = []
    for i in range(1, max_matches + 1):
        acc = F32(acc + inc)
        folds.append((i, float(acc)))
    spark = positions.sparkSession
    fmap = spark.createDataFrame(folds, "k long, freq float")

    dfs = searcher._lookup_dfs(sorted({term_a, term_b}))
    n = searcher.max_doc
    w = F32(F32(idf(dfs.get(term_a, 0), n))
            + F32(idf(dfs.get(term_b, 0), n)))
    wv = float(F32(w * K1_PLUS_1))
    cache_arr = F.array(*[F.lit(float(v)) for v in searcher.cache])
    stats = searcher.doc_stats().select(
        "doc_id",
        F.element_at(cache_arr, F.col("norm_byte").cast("int") + 1)
        .cast("float").alias("nrm"))

    joined = (agg.join(F.broadcast(fmap), "k")
              .join(stats, "doc_id"))
    span_score = (
        (F.lit(wv).cast("float") * F.col("freq")).cast("float")
        / (F.col("freq") + F.col("nrm")).cast("float")
    ).cast("float")
    pay = (F.col("psum") / F.col("cnt").cast("double")).cast("float")
    out = joined.select(
        "doc_id", (span_score * pay).cast("float").alias("score")
    ).orderBy(F.desc("score"), F.asc("doc_id"))
    return out if k is None else out.limit(k)


def span_payload_check(positions: DataFrame, steps) -> DataFrame:
    """SpanPayloadCheckQuery (search/payloads/SpanPayloadCheckQuery.java
    + SpanPositionCheckQuery.java): accept only the spans of the
    wrapped SpanQuery whose collected payloads EQUAL the expected
    sequence, position by position (acceptPosition ==
    checkCollectedPayloads, :79-95). ``steps`` is a list of
    (term, expected_payload) — the adjacent-ordered SpanNear shape
    (slop=0) the near kernel uses; a single step is the SpanTermQuery
    form. Returns (doc_id, matches) for docs with >=1 accepted span —
    the filter surface; payload SCORING chains are gated separately by
    payload_term_query / payload_near_query.

    Scale shape: one pushed-down scan per step (term + payload
    equality both reach the position-stream scan), (len-1) equi-joins
    on (doc_id, adjacent pos), one count agg; no UDF."""
    first_term, first_pay = steps[0]
    m = positions.filter(
        (F.col("term") == first_term)
        & (F.col("payload") == F.lit(float(first_pay)))
    ).select("doc_id", F.col("pos").alias("p0"))
    for i, (t, pay) in enumerate(steps[1:], start=1):
        nxt = positions.filter(
            (F.col("term") == t)
            & (F.col("payload") == F.lit(float(pay)))
        ).select("doc_id", F.col("pos").alias(f"p{i}"))
        m = m.join(nxt, "doc_id").filter(
            F.col(f"p{i}") == F.col(f"p{i-1}") + 1)
    return (m.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("matches"))
            .orderBy("doc_id"))


# ---------------------------------------------------------------------------
# PayloadHelper byte codec + the payload-ANNOTATING token filters
# ---------------------------------------------------------------------------
#
# Reference semantics re-expressed:
#
# * ``analysis/common/.../payloads/PayloadHelper.java``: big-endian
#   4-byte int encoding (:38-44); floats go through
#   Float.floatToIntBits (:31-33); decode is the mirror (:59-72).
#
# * ``payloads/NumericPayloadTokenFilter.java:41-60``: a constant
#   float payload (encoded once at construction) is attached to every
#   token whose TypeAttribute equals ``typeMatch``; other tokens are
#   untouched.
#
# * ``payloads/TokenOffsetPayloadTokenFilter.java:44-56``: every token
#   gets an 8-byte payload — first 4 bytes startOffset, last 4 bytes
#   endOffset (both big-endian ints).
#
# * ``payloads/TypeAsPayloadTokenFilter.java:44-55``: the token's type
#   string becomes its payload as UTF-8 bytes; null/empty types attach
#   nothing.
#
# These run at the ANALYSIS tier (before StopFilter in the reference
# chains that use them), so the stream here is tokenizer output:
# (term, position, startOffset, endOffset, type) with the 255-char
# skip rule consuming a position, matching StandardTokenizer.

import struct as _struct


def encode_int(v: int) -> bytes:
    """PayloadHelper.encodeInt (:38-44): 4-byte big-endian int32."""
    return _struct.pack(">i", int(v))


def encode_float(f: float) -> bytes:
    """PayloadHelper.encodeFloat (:31-33): floatToIntBits, big-endian."""
    return _struct.pack(">f", f)


def decode_int(b: bytes, offset: int = 0) -> int:
    """PayloadHelper.decodeInt (:68-72)."""
    return _struct.unpack_from(">i", b, offset)[0]


def decode_float(b: bytes, offset: int = 0) -> float:
    """PayloadHelper.decodeFloat (:59-66)."""
    return _struct.unpack_from(">f", b, offset)[0]


def tokens_with_offsets(text: str):
    """Tokenizer-tier stream with char offsets: list of
    ``[term, pos, start, end, type]`` entries. Boundaries are the
    StandardTokenizer scan (TOKEN_PATTERN), the 255-char skip rule
    consumes a position (StandardTokenizer.java:156-167), terms are
    lowercased (LowerCaseFilter precedes the payload filters in the
    reference chains), offsets index the ORIGINAL text, and type is
    the jflex NUM-vs-ALPHANUM resolution (token_type)."""
    from lucene_solr_spark.functions.analysis import (
        MAX_TOKEN_LENGTH,
        TOKEN_PATTERN,
        token_type,
    )

    out = []
    pos = -1
    for m in TOKEN_PATTERN.finditer(text):
        t = m.group(0)
        pos += 1
        if len(t) > MAX_TOKEN_LENGTH:
            continue
        out.append([t.lower(), pos, m.start(), m.end(), token_type(t)])
    return out


def numeric_payload_filter(stream, payload: float, type_match: str):
    """NumericPayloadTokenFilter: attach the pre-encoded constant
    float payload to every token whose type equals type_match. Returns
    (entry, payload_bytes_or_None) pairs; entries are shared."""
    if type_match is None:
        raise ValueError("typeMatch cannot be null")
    the_payload = encode_float(payload)
    return [(e, the_payload if e[4] == type_match else None)
            for e in stream]


def token_offset_payload_filter(stream):
    """TokenOffsetPayloadTokenFilter: 8-byte payload = encodeInt(start)
    ++ encodeInt(end) on EVERY token."""
    return [(e, encode_int(e[2]) + encode_int(e[3])) for e in stream]


def type_as_payload_filter(stream):
    """TypeAsPayloadTokenFilter: payload = UTF-8 bytes of the type;
    null/empty types attach no payload."""
    return [(e, e[4].encode("utf-8") if e[4] else None) for e in stream]


def payload_encoder(name: str):
    """The PayloadEncoder SPI (payloads/PayloadEncoder.java;
    DelimitedPayloadTokenFilterFactory's encoder attribute): 'float'
    -> FloatEncoder (PayloadHelper.encodeFloat), 'integer' ->
    IntegerEncoder (encodeInt big-endian), 'identity' ->
    IdentityEncoder (UTF-8 bytes of the payload text verbatim,
    IdentityEncoder.java:40-51). Returns str -> bytes."""
    if name == "float":
        return lambda s: encode_float(float(s))
    if name == "integer":
        return lambda s: encode_int(int(s))
    if name == "identity":
        return lambda s: s.encode("utf-8")
    raise ValueError(f"unknown PayloadEncoder {name!r}")


def delimited_payload_bytes(text: str, delimiter: str = "|",
                            encoder: str = "float"):
    """DelimitedPayloadTokenFilter at the byte level: split each
    whitespace token at the LAST delimiter and encode the suffix with
    the named encoder. Returns [(term, payload_bytes|None)] — the
    exact BytesRef stream the reference attaches
    (DelimitedPayloadTokenFilter.java:70-80)."""
    enc = payload_encoder(encoder)
    out = []
    for tok in text.split():
        i = tok.rfind(delimiter)
        if i >= 0:
            out.append((tok[:i], enc(tok[i + 1:])))
        else:
            out.append((tok, None))
    return out
