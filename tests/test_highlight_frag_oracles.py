"""The realistic-fragment highlighter oracles (fvh_fragments,
classic_hl_frags) are recursive-CTE re-derivations of the fragment
walks in search/fvh.py and search/classic_highlighter.py — this module
pins the SQL against the pure-Python walks (themselves gated by the
hand-traced reference golden vectors in test_fvh.py /
test_classic_highlighter.py) on every oracle output row at sf0.001,
plus the dmetaphone generated-CASE oracle against the encoder. No
Spark session needed: the comparison is DuckDB vs pure Python."""

import os

import duckdb
import pytest

from lucene_solr_spark.constants import STOPWORDS

SF_DIR = "/root/testdata/sf0.001"


class _An:
    stopwords = frozenset(STOPWORDS)
    lowercase = True


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'documents.parquet')}'"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def texts(duck):
    return dict(duck.execute(
        "SELECT row_number() OVER (ORDER BY doc_id) - 1, text "
        "FROM documents").fetchall())


def test_fvh_fragments_oracle_matches_python_walk(duck, texts):
    from lucene_solr_spark.driver_entry import _oracles
    from lucene_solr_spark.search.fvh import highlight_doc

    rows = duck.execute(_oracles()["fvh_fragments"]).fetchall()
    assert len(rows) == 10
    phrases = [("merge",), (("fast", "merge"), 2.0)]
    for doc_id, _score, snippet in rows:
        res = highlight_doc(
            texts[doc_id], phrases, _An(), frag_char_size=80,
            max_num_fragments=1)
        assert res and res[0] == snippet, doc_id


def test_classic_hl_frags_oracle_matches_python_walk(duck, texts):
    from lucene_solr_spark.driver_entry import _oracles
    from lucene_solr_spark.search.classic_highlighter import (
        get_best_text_fragments,
    )

    rows = duck.execute(_oracles()["classic_hl_frags"]).fetchall()
    assert len(rows) == 10
    weights = {"merge": 1.0, "table": 1.0}
    for doc_id, _score, snippet, fscore in rows:
        res = get_best_text_fragments(
            texts[doc_id], weights, _An(), fragment_size=60,
            max_num_fragments=2)
        assert " ... ".join(r[0] for r in res) == snippet, doc_id
        assert res[0][1] == fscore, doc_id


def test_dmetaphone_oracle_matches_encoder(duck):
    from lucene_solr_spark.driver_entry import ORACLES
    from lucene_solr_spark.functions.dmetaphone import double_metaphone

    rows = duck.execute(ORACLES["dmetaphone_codes"]).fetchall()
    assert len(rows) == 31
    for term, primary, alternate in rows:
        assert primary != "??", f"vocabulary drift: {term}"
        p, alt = double_metaphone(term, 4)
        assert (p, alt or "") == (primary, alternate), term
