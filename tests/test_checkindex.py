"""CheckIndex gates: a committed index passes every invariant; injected
corruption (stats drift, norm bit-flip) is detected and localized."""

import glob
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def copied_index(built, tmp_path):
    # replicate (NOT copytree): snapshot manifests carry absolute table
    # paths — a raw copy keeps pointing at the shared `built` index and
    # the corruption injections below would mutate it for every later
    # test. replicate() rewrites the manifest paths to the replica.
    from lucene_solr_spark.replicator import replicate

    index_dir, _ = built
    dst = str(tmp_path / "idx_copy")
    replicate(index_dir, dst)
    return dst


def _rewrite_parquet_dir(path, mutate):
    """Read a parquet dir to one arrow table, apply ``mutate``(pandas
    DataFrame) -> DataFrame, rewrite as a single file."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    import pandas as pd
    import pyarrow as pa

    pdf = pd.concat([pq.read_table(f).to_pandas() for f in files],
                    ignore_index=True)
    pdf = mutate(pdf)
    for f in files:
        os.remove(f)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(path, "part-00000.parquet"))


def test_clean_index_passes(spark, built):
    from lucene_solr_spark.checkindex import check_index

    index_dir, _ = built
    res = check_index(spark, index_dir)
    assert res["ok"], res


def test_detects_stats_drift(spark, copied_index):
    from lucene_solr_spark.catalog import Catalog
    from lucene_solr_spark.checkindex import check_index

    snap = Catalog(copied_index).latest()
    ts_path = snap.tables["term_stats"]

    def bump_df(pdf):
        pdf.loc[pdf.index[0], "df"] = int(pdf.iloc[0]["df"]) + 1
        return pdf

    _rewrite_parquet_dir(ts_path, bump_df)
    res = check_index(spark, copied_index)
    assert not res["ok"]
    assert res["checks"]["term_stats"] >= 1
    # untouched invariants stay green
    assert res["checks"]["codec"] == 0
    assert res["checks"]["norms"] == 0


def test_detects_norm_corruption(spark, copied_index):
    from lucene_solr_spark.catalog import Catalog
    from lucene_solr_spark.checkindex import check_index
    from lucene_solr_spark.indexing.build import read_segments_any

    snap = Catalog(copied_index).latest()
    # find the parquet dir holding segment meta rows and flip one norm
    seg_entry = snap.tables["segments"]
    paths = seg_entry if isinstance(seg_entry, list) else [seg_entry]
    flipped = {"done": False}

    def flip(pdf):
        if "norms_enc" in pdf.columns and not flipped["done"]:
            meta_rows = pdf.index[pdf["norms_enc"].notna()]
            if len(meta_rows):
                i = meta_rows[0]
                b = bytearray(pdf.at[i, "norms_enc"])
                b[0] ^= 0x40
                pdf.at[i, "norms_enc"] = bytes(b)
                flipped["done"] = True
        return pdf

    seen = set()
    for p in paths:
        for sub in sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                                    recursive=True)):
            d = os.path.dirname(sub)
            if d in seen:
                continue
            seen.add(d)
            t = pq.read_table(sub)
            # pandas roundtrips of nullable-int leaf dirs corrupt
            # schemas; only rewrite the dir actually holding norms
            if "norms_enc" not in t.column_names or \
                    t.column("norms_enc").null_count == t.num_rows:
                continue
            _rewrite_parquet_dir(d, flip)
            if flipped["done"]:
                break
        if flipped["done"]:
            break
    assert flipped["done"]
    res = check_index(spark, copied_index, check_doc_lens=False)
    assert not res["ok"]
    assert res["checks"]["norms"] >= 1
