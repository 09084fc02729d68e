"""LogMergePolicy gates: findMerges selection vectors hand-traced from
lucene/core/.../index/LogMergePolicy.java:464-596, and the
generation-compaction execution path (concat-only: search results must
be bit-identical before/after)."""

import numpy as np
import pytest

from lucene_solr_spark.corpusgen import CORPUS_SCHEMA, corpus_rows
from lucene_solr_spark.indexing.build import (
    IndexWriter,
    _as_list,
    append_documents,
)
from lucene_solr_spark.indexing.merge_policy import (
    LogByteSizeMergePolicy,
    LogDocMergePolicy,
    compact_generations,
    find_merges,
)
from lucene_solr_spark.catalog import Catalog
from lucene_solr_spark.search.executor import IndexSearcher


# -- findMerges selection vectors -------------------------------------------

def test_single_full_window_at_floor():
    # 10 segments exactly at minMergeSize: all at the floor level,
    # levelBottom forced to -1, one mergeFactor window
    assert find_merges([1000] * 10, 10, 1000) == [(0, 10)]


def test_remainder_below_merge_factor_left_unmerged():
    assert find_merges([1000] * 25, 10, 1000) == [(0, 10), (10, 20)]


def test_not_enough_segments_no_merge():
    assert find_merges([1000] * 9, 10, 1000) == []


def test_large_segment_starts_its_own_level():
    # One 10M-doc segment is >LEVEL_LOG_SPAN above the 1k tail: it is
    # quantized alone (no window fits), the tail merges separately
    assert find_merges([10 ** 7] + [1000] * 10, 10, 1000) == [(1, 11)]


def test_tiny_segments_floored_merge_together():
    # All below minMergeSize -> all at the floor, merged as one level
    assert find_merges([10] * 10, 10, 1000) == [(0, 10)]


def test_max_merge_docs_skips_window_but_consumes_it():
    # Window containing an over-limit segment is skipped; the cursor
    # still advances past it (anyTooLarge, :559-589)
    sizes = [1000] * 10
    docs = [1000] * 5 + [10 ** 9] + [1000] * 4
    assert find_merges(sizes, 10, 1000, doc_counts=docs,
                       max_merge_docs=10 ** 6) == []
    # with 20 segments the second window is clean
    sizes = [1000] * 20
    docs = [10 ** 9] + [1000] * 19
    assert find_merges(sizes, 10, 1000, doc_counts=docs,
                       max_merge_docs=10 ** 6) == [(10, 20)]


def test_level_span_boundary_within_075():
    # sizes within one LEVEL_LOG_SPAN of the max all land in one level:
    # 5000 vs 1000 with mf=10 -> levels ~3.70 vs 3.0, span 0.75 ->
    # bottom ~2.95, so ALL 10 segments are in the window
    assert find_merges([5000] + [1000] * 9, 10, 100) == [(0, 10)]
    # 50000 vs 1000 -> levels ~4.70 vs 3.0: tail falls below bottom
    # (3.95) and the big head can't fill a window alone
    assert find_merges([50000] + [1000] * 9, 10, 100) == []


def test_policy_defaults():
    # LogDoc: min 1000 docs; LogByteSize: min 1.6MB
    assert LogDocMergePolicy().find_merges([500] * 10) == [(0, 10)]
    mb = 1024 * 1024
    assert LogByteSizeMergePolicy().find_merges(
        [mb] * 10) == [(0, 10)]
    # 3GB segments exceed maxMergeSize (2048 MB) -> skipped windows
    assert LogByteSizeMergePolicy().find_merges(
        [3 * 1024 * mb] * 10) == []


def test_merge_factor_window_size():
    assert find_merges([1000] * 10, 5, 1000) == [(0, 5), (5, 10)]


# -- execution over postings generations -------------------------------------

def test_compact_generations_is_result_invariant(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("loggc"))
    rows = corpus_rows(160)
    corpus = spark.createDataFrame(rows[:100], schema=CORPUS_SCHEMA)
    IndexWriter(spark, index_dir, docs_per_segment=32, n_batches=2).build(
        corpus)
    for lo in (100, 120, 140):
        delta = spark.createDataFrame(
            rows[lo:lo + 20], schema=CORPUS_SCHEMA)
        append_documents(spark, index_dir, delta)

    cat = Catalog(index_dir)
    snap = cat.latest_at_stage("commit", "merge", "delete")
    gens_before = _as_list(snap.tables["postings"])
    # 2 build batch generations + 3 appends
    assert len(gens_before) == 5

    s1 = IndexSearcher(spark, index_dir)
    probes = ["common_util", "base_handler core_ctx"]
    before = {
        q: [(r["doc_id"], np.float32(r["score"]))
            for r in s1.search(q, k=None).collect()]
        for q in probes
    }

    # tiny floor so every generation is below it -> pairwise windows
    out = compact_generations(
        spark, index_dir,
        LogByteSizeMergePolicy(merge_factor=2, min_merge_mb=1e-6))
    assert out is not None
    gens_after = _as_list(out.tables["postings"])
    # pairwise windows over 5: (0,2),(2,4), remainder kept
    assert len(gens_after) == 3
    assert gens_after != gens_before

    s2 = IndexSearcher(spark, index_dir)
    for q in probes:
        after = [(r["doc_id"], np.float32(r["score"]))
                 for r in s2.search(q, k=None).collect()]
        assert after == before[q]

    # nothing selected on a single generation -> no-op
    assert compact_generations(
        spark, index_dir,
        LogByteSizeMergePolicy(merge_factor=4, min_merge_mb=1e-6)) is None
