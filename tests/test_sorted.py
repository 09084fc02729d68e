"""SortedIndex gates: the early-terminated sorted top-k equals the
full-sort answer, and actually touches only a prefix of the bucket
dirs (the EarlyTerminatingSortingCollector property)."""

import pytest


@pytest.fixture(scope="module")
def sorted_idx(spark, built, tmp_path_factory):
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.search.sorted import SortedIndex

    index_dir, _ = built
    s = IndexSearcher(spark, index_dir)
    out = str(tmp_path_factory.mktemp("sorted"))
    return s, SortedIndex.build(s, "doc_len", out, buckets=8)


def _full_sort(s, ascending, k):
    df = s.doc_stats().select("doc_id", "doc_len")
    rows = sorted(
        [(r.doc_id, r.doc_len) for r in df.collect()],
        key=lambda t: (t[1], t[0]) if ascending else (-t[1], -t[0]),
    )
    return rows[:k]


@pytest.mark.parametrize("ascending", [True, False])
def test_sorted_topk_matches_full_sort(sorted_idx, ascending):
    s, si = sorted_idx
    got = [(r.doc_id, r.doc_len)
           for r in si.top(10, ascending=ascending).collect()]
    assert got == _full_sort(s, ascending, 10)


def test_early_termination_reads_prefix_only(sorted_idx):
    s, si = sorted_idx
    n_buckets = len(si._bucket_dirs())
    assert n_buckets >= 4  # fixture has enough docs to spread
    assert si.files_read_for(10) < n_buckets
    assert si.files_read_for(10, ascending=False) < n_buckets
    # asking for everything reads everything
    assert si.files_read_for(10 ** 9) == n_buckets
