"""Replication gates: a replica serves identical results; a second
replicate after an append is incremental (copies only the new
generation) and the replica flips atomically to the new snapshot."""

import numpy as np

F32 = np.float32


def _top(searcher, q="seven hundred", k=10):
    return [(r.doc_id, F32(r.score))
            for r in searcher.search(q, k=k).collect()]


def test_replica_identical_and_incremental(spark, built, small_corpus,
                                           tmp_path):
    from lucene_solr_spark.replicator import replicate
    from lucene_solr_spark.search.executor import IndexSearcher

    src, _ = built
    dst = str(tmp_path / "replica")

    stats = replicate(src, dst)
    assert stats["files_copied"] > 0
    s_src = IndexSearcher(spark, src)
    s_dst = IndexSearcher(spark, dst)
    assert _top(s_src) == _top(s_dst)

    # idempotent: nothing to copy the second time
    stats2 = replicate(src, dst)
    assert stats2["files_copied"] == 0
    assert stats2["files_skipped"] == stats["files_copied"] \
        + stats["files_skipped"]


def test_replica_follows_append(spark, small_corpus, tmp_path):
    from lucene_solr_spark.corpusgen import CORPUS_SCHEMA
    from lucene_solr_spark.indexing.build import (IndexWriter,
                                                  append_documents)
    from lucene_solr_spark.replicator import replicate
    from lucene_solr_spark.search.executor import IndexSearcher

    src = str(tmp_path / "src")
    dst = str(tmp_path / "replica")
    base = spark.createDataFrame(small_corpus[:200], schema=CORPUS_SCHEMA)
    extra = spark.createDataFrame(small_corpus[200:260],
                                  schema=CORPUS_SCHEMA)
    IndexWriter(spark, src, docs_per_segment=64, n_batches=2).build(base)
    replicate(src, dst)

    append_documents(spark, src, extra)
    stats = replicate(src, dst)
    assert stats["files_copied"] > 0          # only the new generation
    s_src = IndexSearcher(spark, src)
    s_dst = IndexSearcher(spark, dst)
    assert s_src.max_doc == s_dst.max_doc == 260
    assert _top(s_src) == _top(s_dst)
