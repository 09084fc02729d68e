"""FuzzyLikeThisQuery gates (sandbox/queries/FuzzyLikeThisQuery.java,
ignoreTF mode) — variant selection and constant-score sum behavior on
the built fixture; exactness vs DuckDB is gated by the
fuzzy_like_this_top10 driver entry."""

import numpy as np

from lucene_solr_spark.fixtures import PHRASE_QUERY_SET
from lucene_solr_spark.search.executor import IndexSearcher


def test_exact_term_dominates_and_misspelling_matches(spark, built):
    index_dir, _ = built
    s = IndexSearcher(spark, index_dir)
    a = PHRASE_QUERY_SET[0].split()[0]
    exact_docs = {r["doc_id"] for r in
                  s.search_boolean(a, k=None).collect()}
    # exact query term: FLT must cover at least the exact term's docs
    flt_docs = {r["doc_id"] for r in
                s.fuzzy_like_this(a, k=None).collect()}
    assert exact_docs <= flt_docs
    # single-char misspelling still reaches the exact term's docs
    missp = a[:-1] + ("x" if a[-1] != "x" else "y")
    m_docs = {r["doc_id"] for r in
              s.fuzzy_like_this(missp, k=None).collect()}
    assert exact_docs <= m_docs


def test_no_match_empty(spark, built):
    index_dir, _ = built
    s = IndexSearcher(spark, index_dir)
    out = s.fuzzy_like_this("zzzzqqqqxxxx", k=10)
    assert out.count() == 0


def test_scores_positive_f32(spark, built):
    index_dir, _ = built
    s = IndexSearcher(spark, index_dir)
    a = PHRASE_QUERY_SET[0].split()[0]
    rows = s.fuzzy_like_this(a, k=5).collect()
    assert rows
    for r in rows:
        assert np.float32(r["score"]) > 0
