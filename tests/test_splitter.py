"""PKIndexSplitter / MultiPassIndexSplitter gates: split parts must
score like the full index restricted to their live docs (stats keep
counting deleted docs — PKIndexSplitter doesn't rewrite postings), the
parts must partition the docID space, and addIndexes-style recombine
must round-trip ranks."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpusgen import generate_corpus
from lucene_solr_spark.indexing.build import IndexWriter, merge_postings
from lucene_solr_spark.indexing.splitter import multipass_split, pk_split
from lucene_solr_spark.search.executor import IndexSearcher

N_DOCS = 600


@pytest.fixture(scope="module")
def split_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pksplit")
    full = str(root / "full")
    corpus = generate_corpus(spark, N_DOCS, partitions=4)
    IndexWriter(spark, full, docs_per_segment=128, n_batches=2).build(
        corpus)
    merge_postings(spark, full, segs_per_group=4)
    searcher = IndexSearcher(spark, full)
    # median stored path as the PK split point
    mid = searcher._docs.orderBy("path").limit(N_DOCS // 2 + 1) \
        .agg(F.max("path")).first()[0]
    a, b = str(root / "lt"), str(root / "ge")
    pk_split(spark, full, a, b, F.col("path") < F.lit(mid))
    return {"full": full, "lt": a, "ge": b, "mid": mid}


def _hits(s, q, **kw):
    return [(r["doc_id"], float(r["score"]))
            for r in s.search(q, k=None, **kw).collect()]


def test_parts_partition_docid_space(spark, split_dirs):
    sa = IndexSearcher(spark, split_dirs["lt"])
    sb = IndexSearcher(spark, split_dirs["ge"])
    la = {r["doc_id"] for r in sa._live(sa._docs.select("doc_id")).collect()}
    lb = {r["doc_id"] for r in sb._live(sb._docs.select("doc_id")).collect()}
    assert la.isdisjoint(lb)
    assert len(la) + len(lb) == N_DOCS
    assert la and lb


def test_part_scores_equal_filtered_full(spark, split_dirs):
    sf = IndexSearcher(spark, split_dirs["full"])
    sa = IndexSearcher(spark, split_dirs["lt"])
    docs_lt = {
        r["doc_id"]
        for r in sf._docs.filter(
            F.col("path") < F.lit(split_dirs["mid"])).collect()
    }
    for q in ("common_util", "seven hundred"):
        want = sorted((d, s) for d, s in _hits(sf, q) if d in docs_lt)
        got = sorted(_hits(sa, q))
        assert got == want, q


def test_multipass_round_robin(spark, split_dirs, tmp_path):
    dsts = [str(tmp_path / f"p{i}") for i in range(3)]
    multipass_split(spark, split_dirs["full"], dsts)
    for i, d in enumerate(dsts):
        s = IndexSearcher(spark, d)
        live = [r["doc_id"] for r in s._live(s._docs.select("doc_id")).collect()]
        assert live and all(x % 3 == i for x in live)


def test_multipass_seq(spark, split_dirs, tmp_path):
    dsts = [str(tmp_path / f"s{i}") for i in range(2)]
    multipass_split(spark, split_dirs["full"], dsts, seq=True)
    s0 = IndexSearcher(spark, dsts[0])
    live0 = {r["doc_id"] for r in s0._live(s0._docs.select("doc_id")).collect()}
    assert live0 == set(range(N_DOCS // 2))
