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
    for codec in ("for128", "vint_tail", "simpletext"):
        d = str(tmp_path_factory.mktemp(f"idx_{codec}"))
        IndexWriter(spark, d, docs_per_segment=64, n_batches=2,
                    codec=codec).build(corpus)
        dirs[codec] = d
    return dirs


def test_results_bit_identical(spark, two_codec_indexes):
    a = IndexSearcher(spark, two_codec_indexes["for128"])
    others = [IndexSearcher(spark, two_codec_indexes[c])
              for c in ("vint_tail", "simpletext")]
    for q in QUERIES:
        for mode in ("or", "and"):
            ra = [(r["doc_id"], np.float32(r["score"]).tobytes())
                  for r in a.search(q, k=20, mode=mode).collect()]
            for b in others:
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


def test_simpletext_blocks_are_readable_and_upgrade(spark,
                                                    two_codec_indexes):
    """SimpleText parity (lucene/codecs simpletext/
    SimpleTextPostingsFormat): blocks are human-readable ASCII; the
    index passes CheckIndex and IndexUpgrader migrates it to the FOR
    family with bit-identical scores."""
    import re as _re

    from lucene_solr_spark.checkindex import check_index, upgrade_codec

    d = two_codec_indexes["simpletext"]
    report = check_index(spark, d)
    assert report["ok"], report

    # readability probe: a multi-doc posting row's doc block is
    # '\xfd<digits and spaces>\n'
    from lucene_solr_spark.catalog import Catalog
    from lucene_solr_spark.indexing.build import read_postings_any
    snap = Catalog(d).latest_at_stage("commit", "merge", "delete")
    row = (read_postings_any(spark, snap.tables["postings"]).filter("df > 1")
           .select("doc_ids_enc").first())
    buf = bytes(row["doc_ids_enc"])
    assert buf[0] == 0xFD
    body = buf[1:buf.index(b"\n")].decode("ascii")
    assert _re.fullmatch(r"\d+( \d+)*", body), body

    s_before = IndexSearcher(spark, d)
    before = [(r["doc_id"], np.float32(r["score"]).tobytes())
              for r in s_before.search(QUERIES[0], k=20).collect()]
    upgrade_codec(spark, d, codec="for128")
    s_after = IndexSearcher(spark, d)
    after = [(r["doc_id"], np.float32(r["score"]).tobytes())
             for r in s_after.search(QUERIES[0], k=20).collect()]
    assert before == after
    snap2 = Catalog(d).latest_at_stage("commit", "merge", "delete")
    assert snap2.props.get("codec") == "for128"
