"""Term-vector sidecar (r2 verdict item 6): build_term_vectors writes
the FieldTermStack content (term, position, char offsets per
occurrence — CompressingTermVectorsWriter semantics relationally) and
the FVH sidecar path must produce OUTPUT-IDENTICAL fragments to the
re-analysis path (dual-exec gate), with the stack coming from a join,
not a tokenizer kernel."""

import pytest

from lucene_solr_spark.constants import STOPWORDS


class _An:
    stopwords = frozenset(STOPWORDS)
    lowercase = True


@pytest.fixture(scope="module")
def corpus(spark):
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        os.path.join("/root/testdata/sf0.001", "documents.parquet"))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("content"))


def test_sidecar_matches_reanalysis_stack(spark, corpus):
    """Every sidecar row equals the pure _term_stack derivation."""
    from lucene_solr_spark.search.fvh import (
        _term_stack,
        build_term_vectors,
    )

    tv = build_term_vectors(corpus, _An()).collect()
    got = {}
    for r in tv:
        got.setdefault(int(r["doc_id"]), []).append(
            (r["term"], int(r["pos"]), int(r["start"]), int(r["end"])))
    texts = {int(r["doc_id"]): r["content"]
             for r in corpus.collect()}
    assert set(got) <= set(texts)
    n_checked = 0
    for did, text in texts.items():
        expect = _term_stack(text, _An())
        assert sorted(got.get(did, [])) == sorted(expect), did
        n_checked += 1
    assert n_checked == 500


def test_sidecar_charfiltered_matches_reanalysis(spark):
    """Charfiltered analyzer (html_strip_std): the sidecar must run
    the charfilter and correct offsets back to the RAW stored text
    (r3 advice — the stub analyzer previously dropped pre_offsets,
    tokenizing raw HTML with uncorrected offsets)."""
    from lucene_solr_spark.functions.analysis import get_analyzer
    from lucene_solr_spark.search.fvh import (
        _term_stack,
        build_term_vectors,
    )

    an = get_analyzer("html_strip_std")
    rows = [
        (0, "<p>Merge <b>sort</b> beats bubble</p>"),
        (1, "plain text no markup here"),
        (2, "<div class='x'>the &amp; quick INDEX</div>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    tv = build_term_vectors(df, an).collect()
    got = {}
    for r in tv:
        got.setdefault(int(r["doc_id"]), []).append(
            (r["term"], int(r["pos"]), int(r["start"]), int(r["end"])))
    for did, text in rows:
        expect = _term_stack(text, an)
        assert sorted(got.get(did, [])) == sorted(expect), did
    # offsets slice the RAW html: doc 0's first token is "merge" at
    # the raw-text span covering "Merge" (inside the <p> tag offsets)
    d0 = sorted(got[0], key=lambda t: t[1])
    t, _p, s, e = d0[0]
    assert t == "merge"
    assert rows[0][1][s:e].lower().strip("<>") .startswith("merge") or \
        "merge" in rows[0][1][s:e].lower()


def test_fvh_dual_exec_identical(spark, corpus):
    """fvh through the sidecar == fvh through re-analysis, row for
    row (fragments AND scores), on real top-k hits."""
    from lucene_solr_spark.driver_entry import get_searcher
    from lucene_solr_spark.search.fvh import (
        build_term_vectors,
        fast_vector_highlight,
    )

    s = get_searcher(spark, "/root/testdata/sf0.001")
    from pyspark.sql import functions as F

    docs = corpus.select(
        F.format_string("%012d", F.col("doc_id")).alias("path"),
        "content")
    store = s._docs.select("doc_id", "path").join(docs, "path").select(
        "doc_id", "content")
    tv = build_term_vectors(store, s.analyzer)
    phrases = [("merge",), (("fast", "merge"), 2.0)]
    kw = dict(k=10, frag_char_size=80, max_num_fragments=1)
    base = fast_vector_highlight(s, store, "merge", phrases, **kw)
    side = fast_vector_highlight(s, store, "merge", phrases,
                                 term_vectors=tv, **kw)
    b = [(r["doc_id"], tuple(r["fragments"]), tuple(r["frag_scores"]))
         for r in base.collect()]
    v = [(r["doc_id"], tuple(r["fragments"]), tuple(r["frag_scores"]))
         for r in side.collect()]
    assert b == v
    assert len(b) == 10
