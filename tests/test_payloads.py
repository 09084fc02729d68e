"""Payload gates: DelimitedPayloadTokenFilter parsing vectors and the
PayloadTermQuery fold (AveragePayloadFunction, docScore=1 fallback)."""

import numpy as np
from pyspark.sql import functions as F

F32 = np.float32


def test_delimited_payload_vectors(spark):
    """Parsing mirrors DelimitedPayloadTokenFilter + FloatEncoder:
    split at LAST delimiter, float suffix, no-delimiter -> NULL."""
    from lucene_solr_spark.functions.payloads import delimited_payload

    rows = [("the|0.5",), ("quick",), ("a|b|2.25",), ("x|",), ("lazy|3",)]
    df = spark.createDataFrame(rows, "tok string").select(
        delimited_payload(F.col("tok")).alias("tp")
    ).select("tp.term", "tp.payload")
    got = [(r.term, r.payload) for r in df.collect()]
    assert got == [
        ("the", 0.5), ("quick", None), ("a|b", 2.25), ("x", None),
        ("lazy", 3.0),
    ]


def test_payload_table_and_query_fold(spark, built):
    """avg fold = sum/count; docs without payloads keep spanScore
    (docScore = 1, AveragePayloadFunction.docScore)."""
    from lucene_solr_spark.functions.payloads import (payload_table,
                                                      payload_term_query)
    from lucene_solr_spark.search.executor import IndexSearcher

    index_dir, _ = built
    s = IndexSearcher(spark, index_dir)
    # annotate docs with payload = (pos % 3) + 1 over the engine docIDs
    docs = spark.read.parquet(
        *__import__("lucene_solr_spark.indexing.build",
                    fromlist=["_as_list"])._as_list(s.snap.tables["docs"]))
    # rebuild the text from the corpus generator for the same keys
    from lucene_solr_spark.corpusgen import corpus_rows

    rows = corpus_rows(300)
    rows_sorted = sorted(rows, key=lambda r: (r["repo"], r["path"],
                                              r["commit"]))
    ann_rows = []
    for i, r in enumerate(rows_sorted):
        toks = r["content"].split()
        ann_rows.append(
            (i, " ".join(f"{t}|{(j % 3) + 1}"
                         for j, t in enumerate(toks))))
    ann = spark.createDataFrame(ann_rows, "doc_id long, ann string")
    pt = payload_table(ann, text_col="ann")
    term = "seven"
    got = {r.doc_id: F32(r.score)
           for r in payload_term_query(s, pt, term, k=None).collect()}
    span = {r.doc_id: F32(r.score)
            for r in s.search(term, k=None).collect()}
    pays = {r.doc_id: (r.payload_sum, r.payload_cnt)
            for r in pt.filter(F.col("term") == term).collect()}
    assert set(got) == set(span)
    for d, sc in got.items():
        psum, pcnt = pays[d]
        want = F32(span[d] * F32(np.float64(psum) / pcnt))
        assert sc.tobytes() == want.tobytes(), d


def test_payload_min_max_folds(spark, built):
    """Min/MaxPayloadFunction folds (payloads/MinPayloadFunction.java,
    MaxPayloadFunction.java): per-doc min/max payload of the term's
    occurrences scales the span score."""
    from lucene_solr_spark.functions.payloads import (payload_table,
                                                      payload_term_query)
    from lucene_solr_spark.search.executor import IndexSearcher

    index_dir, _ = built
    s = IndexSearcher(spark, index_dir)
    ann = spark.createDataFrame(
        [(0, "seven|1 seven|9 other|5"), (1, "seven|4")],
        "doc_id long, ann string")
    pt = payload_table(ann, text_col="ann")
    rows = {r.doc_id: (r.payload_min, r.payload_max)
            for r in pt.filter(F.col("term") == "seven").collect()}
    assert rows[0] == (1.0, 9.0) and rows[1] == (4.0, 4.0)
    span = {r.doc_id: F32(r.score)
            for r in s.search("seven", k=None).collect()}
    for fn, pick in [("min", 0), ("max", 1)]:
        got = {r.doc_id: F32(r.score) for r in payload_term_query(
            s, pt, "seven", fn=fn, k=None).collect()}
        for d in got:
            if d in rows:
                want = F32(span[d] * F32(rows[d][pick]))
                assert got[d].tobytes() == want.tobytes()


# ---------------------------------------------------------------------------
# PayloadHelper codec + annotating filters + concrete sink filters
# ---------------------------------------------------------------------------

def test_payload_helper_roundtrip():
    """PayloadHelper.java:38-72 — big-endian 4-byte int / float-bits
    round trips, including negatives and the sign bit."""
    import struct

    from lucene_solr_spark.functions.payloads import (
        decode_float, decode_int, encode_float, encode_int)

    for v in (0, 1, -1, 255, -255, 2**31 - 1, -2**31):
        b = encode_int(v)
        assert len(b) == 4
        assert decode_int(b) == v
        # byte layout matches the reference shift chain
        assert b == struct.pack(">i", v)
    for f in (0.0, 1.0, 7.25, -3.5, 1e-7):
        b = encode_float(f)
        assert decode_float(b) == struct.unpack(
            ">f", struct.pack(">f", f))[0]
    # offset-addressed decode (TokenOffsetPayload layout)
    b8 = encode_int(13) + encode_int(99)
    assert decode_int(b8, 0) == 13 and decode_int(b8, 4) == 99


def test_numeric_payload_filter_type_gate():
    """NumericPayloadTokenFilter.java:41-60 — payload only on the
    matching type; null typeMatch throws."""
    import pytest

    from lucene_solr_spark.functions.payloads import (
        decode_float, numeric_payload_filter, tokens_with_offsets)

    s = tokens_with_offsets("the 42 fast 7 rows")
    out = numeric_payload_filter(s, 3.0, "<NUM>")
    got = [(e[0], b is not None) for e, b in out]
    assert got == [("the", False), ("42", True), ("fast", False),
                   ("7", True), ("rows", False)]
    assert all(decode_float(b) == 3.0 for _e, b in out if b)
    with pytest.raises(ValueError):
        numeric_payload_filter(s, 1.0, None)


def test_token_offset_payload_filter():
    """TokenOffsetPayloadTokenFilter.java:44-56 — first 4 bytes start,
    last 4 end, on EVERY token; offsets index the original text."""
    from lucene_solr_spark.functions.payloads import (
        decode_int, token_offset_payload_filter, tokens_with_offsets)

    text = "ab  cde f"
    out = token_offset_payload_filter(tokens_with_offsets(text))
    spans = [(decode_int(b, 0), decode_int(b, 4)) for _e, b in out]
    assert spans == [(0, 2), (4, 7), (8, 9)]
    assert all(text[s:e] == ent[0] for (s, e), (ent, _b)
               in zip(spans, out))


def test_type_as_payload_filter():
    """TypeAsPayloadTokenFilter.java:44-55 — UTF-8 type bytes; the
    jflex NUM resolution drives the type."""
    from lucene_solr_spark.functions.payloads import (
        tokens_with_offsets, type_as_payload_filter)

    out = type_as_payload_filter(tokens_with_offsets("x 12"))
    assert [b for _e, b in out] == [b"<ALPHANUM>", b"<NUM>"]


def test_token_range_sink_counts_every_offer():
    """TokenRangeSinkFilter.java:40-48 — [lower, upper), and the
    counter increments for rejected tokens too (finally block)."""
    from lucene_solr_spark.functions.wordlists import token_range_sink

    acc = token_range_sink(2, 4)
    assert [acc(t, i) for i, t in
            enumerate("a b c d e f".split())] == [
        False, False, True, True, False, False]


def test_token_type_and_date_sinks():
    from lucene_solr_spark.functions.wordlists import (
        date_recognizer_sink, token_type_sink)

    ty = token_type_sink("<NUM>")
    assert [ty(t, 0) for t in ("12", "ab", "1a")] == [
        True, False, False]
    d = date_recognizer_sink()
    assert d("2017-03-05", 0) and d("12/01/1999", 0)
    assert not d("2017-13-05", 0) and not d("plain", 0)
    # injectable parser contract (the DateFormat constructor arg)
    from datetime import datetime
    iso_only = date_recognizer_sink(
        lambda s: datetime.strptime(s, "%Y-%m-%d"))
    assert iso_only("2017-03-05", 0) and not iso_only("12/01/1999", 0)


def test_tee_composes_with_concrete_sinks():
    """One pass, three concrete sinks, source unchanged
    (TeeSinkTokenFilter.java:99-210 + sinks/)."""
    from lucene_solr_spark.functions.wordlists import (
        date_recognizer_sink, tee_sink, token_range_sink,
        token_type_sink)

    tp = [(t, i) for i, t in
          enumerate("9 2017-03-05 b 4 c".split())]
    src, sinks = tee_sink(tp, {
        "rng": token_range_sink(0, 2),
        "num": token_type_sink("<NUM>"),
        "date": date_recognizer_sink(),
    })
    assert src == tp
    assert [t for t, _p in sinks["rng"]] == ["9", "2017-03-05"]
    assert [t for t, _p in sinks["num"]] == ["9", "4"]
    assert [t for t, _p in sinks["date"]] == ["2017-03-05"]
