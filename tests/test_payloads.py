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
