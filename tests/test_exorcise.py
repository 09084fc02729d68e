"""CheckIndex -fix (exorcise): corruption -> attribution -> repaired
snapshot, gated end to end.

Reference: lucene/core/src/java/org/apache/lucene/index/CheckIndex.java
(main() -fix path + exorciseIndex: rewrite the commit without the
unrecoverable segments, losing their documents)."""

import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_spark.catalog import Catalog
from lucene_solr_spark.checkindex import (check_index, exorcise,
                                          find_undecodable_segments)
from lucene_solr_spark.corpusgen import generate_corpus
from lucene_solr_spark.indexing.build import IndexWriter, merge_postings
from lucene_solr_spark.search.executor import IndexSearcher


def _corrupt_one_segment(index_dir: str) -> int:
    """Truncate doc_ids_enc of every encoded row of ONE segment in one
    postings file; returns the victim seg_id."""
    snap = Catalog(index_dir).latest()
    pdirs = snap.tables["postings"]
    pdirs = pdirs if isinstance(pdirs, list) else [pdirs]
    pats = [os.path.join(pdirs[0], "**", "is_meta=false", "**",
                         "*.parquet"),
            os.path.join(pdirs[0], "**", "*.parquet")]
    files = sorted(sum((glob.glob(p, recursive=True) for p in pats), []))
    f = files[0]
    t = pq.read_table(f)
    df = t.to_pandas()
    enc = df["doc_ids_enc"].notna()
    assert enc.any(), "file has no encoded rows"
    target = int(df.loc[enc, "seg_id"].iloc[0])
    hit = (df["seg_id"] == target) & enc
    df.loc[hit, "doc_ids_enc"] = df.loc[hit, "doc_ids_enc"].map(
        lambda b: b[: max(1, len(b) // 2)])
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False), f)
    crc = os.path.join(os.path.dirname(f),
                       "." + os.path.basename(f) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)
    return target


@pytest.fixture(scope="module")
def fresh_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("exo") / "idx")
    corpus = generate_corpus(spark, 1500, partitions=8)
    IndexWriter(spark, idx, docs_per_segment=256, n_batches=2).build(corpus)
    return idx


def test_exorcise_fresh_index(spark, fresh_index):
    idx = fresh_index
    target = _corrupt_one_segment(idx)

    rep = check_index(spark, idx)
    assert not rep["ok"] and rep["checks"]["codec"] > 0

    bad = find_undecodable_segments(spark, idx)
    # fresh (unmerged) rows are 1:1 with segments: surgical attribution
    assert bad == [target]

    before = Catalog(idx).latest()
    snap = exorcise(spark, idx)
    assert snap.props["exorcised_seg_ids"] == [target]
    (lo, hi), = snap.props["exorcised_ranges"]

    rep2 = check_index(spark, idx)
    assert rep2["ok"], rep2["checks"]

    s = IndexSearcher(spark, idx)
    # quarantined docs are gone from the committed stats and the results
    segs_before = {int(r["seg_id"]): int(r["doc_count"])
                   for r in _seg_rows(spark, before)}
    assert s.max_doc == sum(v for k, v in segs_before.items()
                            if k != target)
    hits = s.search("common_util base_handler", k=10, mode="or").collect()
    assert hits and all(not (lo <= int(r["doc_id"]) < hi) for r in hits)


def _seg_rows(spark, snap):
    from lucene_solr_spark.indexing.build import read_segments_any
    return read_segments_any(
        spark, snap.tables["segments"]).select(
        "seg_id", "doc_count").collect()


def test_exorcise_merged_index_expands_to_group(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("exo_m") / "idx")
    corpus = generate_corpus(spark, 1500, partitions=8)
    IndexWriter(spark, idx, docs_per_segment=256, n_batches=2).build(corpus)
    merge_postings(spark, idx, segs_per_group=4)

    target = _corrupt_one_segment(idx)
    bad = find_undecodable_segments(spark, idx)
    # merged rows aggregate their scoring group: the quarantine unit
    # widens to every segment of the flagged row's gid
    snap = Catalog(idx).latest()
    gfac = int(snap.props["group_factor"])
    assert target in bad
    assert all(b // gfac == target // gfac for b in bad)

    snap2 = exorcise(spark, idx, bad_seg_ids=bad)
    rep = check_index(spark, idx)
    assert rep["ok"], rep["checks"]
    s = IndexSearcher(spark, idx)
    assert s.search("common_util", k=5).count() > 0
    assert snap2.props["exorcised_seg_ids"] == bad
