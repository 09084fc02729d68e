"""End-to-end pluggable-codec gate: an index built with the
'vint_tail' family must be bit-identical in RESULTS to the default
'for128' build (same scores, same ranks — only the bytes differ), and
must pass CheckIndex."""

import numpy as np
import pytest

from lucene_solr_spark.corpusgen import corpus_rows
from lucene_solr_spark.indexing.build import IndexWriter
from lucene_solr_spark.search.executor import IndexSearcher

QUERIES = ["common_util", "base_handler seven", "one thousand"]


@pytest.fixture(scope="module")
def two_codec_indexes(spark, tmp_path_factory):
    rows = corpus_rows(400)
    corpus = spark.createDataFrame(rows)
    dirs = {}
    for codec in ("for128", "vint_tail"):
        d = str(tmp_path_factory.mktemp(f"idx_{codec}"))
        IndexWriter(spark, d, docs_per_segment=64, n_batches=2,
                    codec=codec).build(corpus)
        dirs[codec] = d
    return dirs


def test_results_bit_identical(spark, two_codec_indexes):
    a = IndexSearcher(spark, two_codec_indexes["for128"])
    b = IndexSearcher(spark, two_codec_indexes["vint_tail"])
    for q in QUERIES:
        for mode in ("or", "and"):
            ra = [(r["doc_id"], np.float32(r["score"]).tobytes())
                  for r in a.search(q, k=20, mode=mode).collect()]
            rb = [(r["doc_id"], np.float32(r["score"]).tobytes())
                  for r in b.search(q, k=20, mode=mode).collect()]
            assert ra == rb, (q, mode)


def test_vint_index_passes_checkindex(spark, two_codec_indexes):
    from lucene_solr_spark.checkindex import check_index

    report = check_index(spark, two_codec_indexes["vint_tail"])
    assert report["ok"], report


def test_codec_pinned_in_snapshot(spark, two_codec_indexes):
    from lucene_solr_spark.catalog import Catalog

    snap = Catalog(two_codec_indexes["vint_tail"]).latest_at_stage(
        "commit", "merge", "delete")
    assert snap.props.get("codec") == "vint_tail"
