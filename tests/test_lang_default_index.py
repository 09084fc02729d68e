"""End-to-end index build + search through a reference-default
language chain (analyzer='fr_default'): proves the composed chains
work as INDEX analyzers — default stop set excluded from the
dictionary (df/norms match the reference default), light stems
unify inflections, elision strips articles — not just as per-entry
token streams. French corpus text from TestFrenchAnalyzer's own
vocabulary."""

import shutil

import pytest

from lucene_solr_spark.indexing.build import IndexWriter, merge_postings
from lucene_solr_spark.search.executor import IndexSearcher


DOCS = [
    # (path, content) — stopwords le/la/les/aux/du/des/à, elisions,
    # inflection pairs that stem together (chien/chiens; élément)
    ("d0", "le chien et la chienne mangent"),
    ("d1", "les chiens du quartier"),
    ("d2", "l'élément principal des éléments"),
    ("d3", "cheval à cheval aux chevaux"),
    ("d4", "un chat regarde le chien"),
]


@pytest.fixture(scope="module")
def fr_searcher(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("fr_idx") / "index")
    corpus = spark.createDataFrame(
        [("r", p, "c", "fr", t) for p, t in DOCS],
        "repo string, path string, commit string, lang string, "
        "content string")
    w = IndexWriter(spark, idx, docs_per_segment=4, n_batches=1,
                    analyzer="fr_default")
    w.build(corpus)
    merge_postings(spark, idx, segs_per_group=8)
    s = IndexSearcher(spark, idx)
    yield s
    shutil.rmtree(idx, ignore_errors=True)


def test_stopwords_absent_from_dictionary(fr_searcher):
    terms = {r["term"] for r in
             fr_searcher._term_stats.select("term").collect()}
    # default French stop set excluded at index time
    assert not terms & {"le", "la", "les", "aux", "du", "des", "à",
                        "et", "un"}
    # stems present (FrenchLightStemmer output forms)
    assert "chien" in terms       # chien/chiens -> chien
    assert "element" in terms     # l'élément/éléments -> element


def test_df_unifies_inflections(fr_searcher):
    stats = {r["term"]: int(r["df"]) for r in
             fr_searcher._term_stats.select("term", "df").collect()}
    # chien appears via: d0 (chien + chienne->chien? chienne stems
    # separately), d1 (chiens->chien), d4 (chien) — df >= 3
    assert stats["chien"] >= 3
    # elision + accent fold + stem: d2's l'élément and éléments both
    # produce element in ONE doc -> df == 1
    assert stats["element"] == 1


def test_search_matches_stemmed_and_elided(fr_searcher):
    # query analyzed with the SAME pinned chain: 'chiens' stems to
    # chien and matches docs indexed from chien/chiens
    hits = {int(r["doc_id"]) for r in
            fr_searcher.search("chiens", k=None).collect()}
    assert len(hits) >= 3
    # a pure-stopword query matches nothing
    assert fr_searcher.search("le la des", k=None).count() == 0
    # elided query form matches the elided indexed form
    h2 = fr_searcher.search("l'élément", k=None).count()
    assert h2 == 1


def test_analyzer_pinned_in_snapshot(fr_searcher):
    assert fr_searcher.analyzer.name == "fr_default"
