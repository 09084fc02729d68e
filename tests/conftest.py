import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from lucene_solr_spark.session import get_spark

    s = get_spark(app_name="lss-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus():
    """sf-s tier: 300 docs (kept small so the pure-Python oracle stays
    fast in unit tests; bench tiers are generated separately)."""
    from lucene_solr_spark.corpusgen import corpus_rows

    return corpus_rows(300)


@pytest.fixture(scope="session")
def built(spark, small_corpus, tmp_path_factory):
    """One committed index + matching pure-Python oracle, shared by all
    read-only engine-vs-oracle gates (mutating tests build their own)."""
    from lucene_solr_spark.corpusgen import CORPUS_SCHEMA
    from lucene_solr_spark.indexing.build import IndexWriter
    from lucene_solr_spark.oracle import OracleIndex

    index_dir = str(tmp_path_factory.mktemp("idx"))
    corpus = spark.createDataFrame(small_corpus, schema=CORPUS_SCHEMA)
    writer = IndexWriter(spark, index_dir, docs_per_segment=64, n_batches=3)
    snap = writer.build(corpus)
    assert snap.stage == "commit"

    # oracle over the SAME docID assignment (rank over repo,path,commit)
    docs_sorted = sorted(
        small_corpus, key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    oracle = OracleIndex.build(
        [(i, r["content"]) for i, r in enumerate(docs_sorted)]
    )
    return index_dir, oracle
