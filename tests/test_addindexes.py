"""addIndexes gates (IndexWriter.addIndexes(Directory...) +
misc/IndexMergeTool.java): a corpus split into two indexes and merged
by docID rebase must be indistinguishable from the single full index —
same scored ranks, same phrase matches (position streams survive the
boundary split), and CheckIndex-clean."""

import shutil

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.checkindex import check_index
from lucene_solr_spark.corpusgen import generate_corpus
from lucene_solr_spark.indexing.addindexes import add_indexes
from lucene_solr_spark.indexing.build import IndexWriter, merge_postings
from lucene_solr_spark.search.executor import IndexSearcher

N_DOCS = 900
SPLIT = 611  # deliberately unaligned to every segment/group boundary


@pytest.fixture(scope="module")
def combined(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("addidx")
    corpus = generate_corpus(spark, N_DOCS, partitions=4).cache()
    # dense docIDs are rank over (repo, path, commit); splitting on the
    # global rank keeps A+B's docID space equal to the full index's
    from pyspark.sql import Window

    ranked = corpus.withColumn(
        "_rk",
        F.row_number().over(
            Window.orderBy("repo", "path", "commit")) - 1,
    ).cache()
    dirs = {}
    for name, pred in (("full", F.lit(True)),
                       ("a", F.col("_rk") < SPLIT),
                       ("b", F.col("_rk") >= SPLIT)):
        d = str(root / name)
        shutil.rmtree(d, ignore_errors=True)
        IndexWriter(spark, d, docs_per_segment=128, n_batches=2).build(
            ranked.filter(pred).drop("_rk"))
        merge_postings(spark, d, segs_per_group=4)
        dirs[name] = d
    add_indexes(spark, dirs["a"], [dirs["b"]])
    return dirs


def _rows(df):
    return [(r["doc_id"], float(r["score"])) for r in df.collect()]


def test_scored_search_matches_full_index(spark, combined):
    sa = IndexSearcher(spark, combined["a"])
    sf = IndexSearcher(spark, combined["full"])
    assert sa.max_doc == sf.max_doc == N_DOCS
    assert sa.avgdl == sf.avgdl
    for q, kw in (("common_util", {}),
                  ("seven hundred", {"mode": "and"}),
                  ("merge vector table", {"mode": "or"})):
        got = _rows(sa.search(q, k=20, **kw))
        want = _rows(sf.search(q, k=20, **kw))
        assert got == want, q


def test_phrase_positions_survive_split(spark, combined):
    # phrase scoring decodes prox streams — gates the position
    # re-encode on boundary-straddling rows
    sa = IndexSearcher(spark, combined["a"])
    sf = IndexSearcher(spark, combined["full"])
    # a phrase guaranteed to exist: the first two tokens of a real doc
    sample = generate_corpus(spark, N_DOCS, partitions=4).select(
        "content").first()["content"]
    phrase = " ".join(sample.split()[:2])
    got = _rows(sa.search_phrase(phrase, k=20))
    want = _rows(sf.search_phrase(phrase, k=20))
    assert got == want
    assert len(want) > 0


def test_combined_index_is_checkindex_clean(spark, combined):
    rep = check_index(spark, combined["a"], raise_on_failure=False)
    assert rep["ok"], rep


def test_analyzer_mismatch_rejected(spark, combined, tmp_path):
    d = str(tmp_path / "ws")
    corpus = generate_corpus(spark, 50, partitions=2)
    IndexWriter(spark, d, docs_per_segment=128, n_batches=1,
                analyzer="whitespace").build(corpus)
    with pytest.raises(ValueError, match="analyzer"):
        add_indexes(spark, combined["a"], [d])
