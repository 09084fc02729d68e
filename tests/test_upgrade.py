"""IndexUpgrader analogue: codec-family migration of a committed index.

Reference: lucene/core/src/java/org/apache/lucene/index/IndexUpgrader.java
(rewrite every segment under the current codec). Gates: the upgraded
index passes the full CheckIndex audit, pins the new family in the
snapshot props, and scores bit-identically (BM25 + phrase) to the
pre-upgrade index."""

import pytest

from lucene_solr_spark.checkindex import check_index, upgrade_codec
from lucene_solr_spark.corpusgen import generate_corpus
from lucene_solr_spark.indexing.build import IndexWriter
from lucene_solr_spark.search.executor import IndexSearcher


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("upg") / "idx")
    IndexWriter(spark, idx, docs_per_segment=256, n_batches=2).build(
        generate_corpus(spark, 1500, partitions=8))
    return idx


def _probe(spark, idx):
    s = IndexSearcher(spark, idx)
    top = [(int(r["doc_id"]), float(r["score"])) for r in
           s.search("common_util base_handler seven", k=10,
                    mode="or").collect()]
    ph = [(int(r["doc_id"]), float(r["score"])) for r in
          s.search_phrase('"seven hundred"', k=10).collect()]
    return top, ph


def test_upgrade_vint_tail_bit_identical(spark, built):
    pre = _probe(spark, built)
    snap = upgrade_codec(spark, built, codec="vint_tail")
    assert snap.props["codec"] == "vint_tail"
    assert snap.props["upgraded_from"] == "for128"
    rep = check_index(spark, built)
    assert rep["ok"], rep["checks"]
    assert _probe(spark, built) == pre


def test_upgrade_unknown_codec_rejected(spark, built):
    with pytest.raises(ValueError):
        upgrade_codec(spark, built, codec="nope")
