"""IndexDeletionPolicy family + IndexFileDeleter reachability GC:
KeepOnlyLastCommit reclaims expired generations while the live commit
answers identically before/after; NoDeletionPolicy keeps every commit;
SnapshotDeletionPolicy pins survive the primary policy and release()
unpins; PersistentSnapshotDeletionPolicy pins survive restart; an
in-flight build's snapshot chain is never GC'd."""

import json
import os

import pytest

from lucene_solr_spark.catalog import Catalog
from lucene_solr_spark.corpusgen import CORPUS_SCHEMA, corpus_rows, row
from lucene_solr_spark.indexing.build import IndexWriter, append_documents
from lucene_solr_spark.indexing.deletion_policy import (
    COMMIT_STAGES,
    KeepOnlyLastCommitDeletionPolicy,
    NoDeletionPolicy,
    PersistentSnapshotDeletionPolicy,
    SnapshotDeletionPolicy,
    delete_unused_files,
)
from lucene_solr_spark.search.executor import IndexSearcher


def _build_two_commits(spark, index_dir):
    corpus = spark.createDataFrame(corpus_rows(160), schema=CORPUS_SCHEMA)
    IndexWriter(spark, index_dir, docs_per_segment=64, n_batches=2).build(
        corpus)
    extra = spark.createDataFrame(
        [row(i) for i in range(160, 200)], schema=CORPUS_SCHEMA)
    append_documents(spark, index_dir, extra)
    return index_dir


def _commit_gens(index_dir):
    cat = Catalog(index_dir)
    out = []
    s = cat.latest()
    while s is not None:
        if s.stage in COMMIT_STAGES:
            out.append(s.snapshot_id)
        s = None if s.parent is None else cat.load_or_none(s.parent)
    return sorted(out)


@pytest.fixture(scope="module")
def gc_index(spark, tmp_path_factory):
    return _build_two_commits(
        spark, str(tmp_path_factory.mktemp("gcidx")))


def test_keep_only_last_commit_reclaims_and_preserves_results(
        spark, tmp_path_factory):
    index_dir = _build_two_commits(
        spark, str(tmp_path_factory.mktemp("konlc")))
    gens_before = _commit_gens(index_dir)
    assert len(gens_before) >= 2
    before = [(r["doc_id"], r["score"]) for r in IndexSearcher(
        spark, index_dir).search("common_util", k=10).collect()]

    snap_files_before = set(os.listdir(os.path.join(index_dir, "snapshots")))
    report = delete_unused_files(
        index_dir, KeepOnlyLastCommitDeletionPolicy())

    # only the newest commit point survives
    assert _commit_gens(index_dir) == [gens_before[-1]]
    assert set(report["deleted_snapshots"])
    assert gens_before[-1] in report["retained_snapshots"]
    # expired manifests really are gone
    snap_files_after = set(os.listdir(os.path.join(index_dir, "snapshots")))
    assert snap_files_after < snap_files_before
    # the old full-build term_stats generation is reclaimed (append
    # wrote term_stats_gen<N>; the original stats/term_stats dir is
    # referenced only by the expired first commit)
    assert any("term_stats" in p for p in report["deleted_paths"])
    # live commit answers bit-identically after GC
    after = [(r["doc_id"], r["score"]) for r in IndexSearcher(
        spark, index_dir).search("common_util", k=10).collect()]
    assert after == before


def test_no_deletion_policy_keeps_all_commits(spark, gc_index):
    gens = _commit_gens(gc_index)
    report = delete_unused_files(gc_index, NoDeletionPolicy())
    assert _commit_gens(gc_index) == gens
    # no commit-point manifest reclaimed
    for g in gens:
        assert os.path.exists(
            os.path.join(gc_index, "snapshots", f"snap-{g}.json"))
    # only non-commit in-flight build state may be dropped (Lucene's
    # deleter reclaims files no commit references even under
    # NoDeletionPolicy); every commit point survives
    assert not set(report["deleted_snapshots"]) & set(gens)
    assert set(gens) <= set(report["retained_snapshots"])


def test_snapshot_pin_survives_primary_and_release_unpins(
        spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("pinidx"))
    corpus = spark.createDataFrame(corpus_rows(160), schema=CORPUS_SCHEMA)
    IndexWriter(spark, index_dir, docs_per_segment=64, n_batches=2).build(
        corpus)

    policy = SnapshotDeletionPolicy(KeepOnlyLastCommitDeletionPolicy())
    with pytest.raises(RuntimeError):
        policy.snapshot()  # not init'ed yet (reference IllegalState)
    delete_unused_files(index_dir, policy)  # onInit
    pinned = policy.snapshot()
    policy.snapshot()  # second pin on the same generation
    pinned_gen = pinned.generation
    pinned_tables = dict(pinned.snap.tables)

    extra = spark.createDataFrame(
        [row(i) for i in range(160, 200)], schema=CORPUS_SCHEMA)
    append_documents(spark, index_dir, extra)

    report = delete_unused_files(index_dir, policy)
    # the pinned generation survived KeepOnlyLastCommit
    assert pinned_gen in report["retained_snapshots"]
    assert os.path.exists(
        os.path.join(index_dir, "snapshots", f"snap-{pinned_gen}.json"))
    for v in pinned_tables.values():
        for p in (v if isinstance(v, list) else [v]):
            assert os.path.exists(p), p

    # refcounts: two pins, one release -> still pinned
    policy.release(pinned_gen)
    assert policy.get_snapshot_count() == 1
    policy.release(pinned_gen)
    with pytest.raises(ValueError):
        policy.release(pinned_gen)

    report2 = delete_unused_files(index_dir, policy)
    assert pinned_gen in report2["deleted_snapshots"]
    assert not os.path.exists(
        os.path.join(index_dir, "snapshots", f"snap-{pinned_gen}.json"))


def test_persistent_pins_survive_restart(spark, tmp_path_factory):
    index_dir = _build_two_commits(
        spark, str(tmp_path_factory.mktemp("persistidx")))
    policy = PersistentSnapshotDeletionPolicy(index_dir)
    delete_unused_files(index_dir, policy)
    gen = policy.snapshot().generation

    # save-file rotation: exactly one snapshots_<N> file exists
    snapdir = os.path.join(index_dir, "snapshots")
    saves = [f for f in os.listdir(snapdir) if f.startswith("snapshots_")]
    assert len(saves) == 1

    # "restart": a fresh instance loads the pin from disk
    policy2 = PersistentSnapshotDeletionPolicy(index_dir)
    assert policy2.get_snapshots() == [gen]
    policy2.release(gen)
    policy3 = PersistentSnapshotDeletionPolicy(index_dir)
    assert policy3.get_snapshots() == []


def test_inflight_build_chain_is_protected(tmp_path):
    # synthesize: commit 0, then an in-flight build (docs+segments)
    index_dir = str(tmp_path / "inflight")
    cat = Catalog(index_dir)
    d0 = os.path.join(index_dir, "data0")
    os.makedirs(d0)
    with open(os.path.join(d0, "x.parquet"), "w") as f:
        f.write("x")
    cat.commit("commit", tables={"docs": d0})
    cat.commit("docs", tables={})
    cat.commit("segments", tables={})
    report = delete_unused_files(
        index_dir, KeepOnlyLastCommitDeletionPolicy())
    # nothing removable: the only commit point is also the base of the
    # in-flight chain
    assert report["deleted_snapshots"] == []
    assert report["deleted_paths"] == []
    assert os.path.exists(os.path.join(d0, "x.parquet"))
    for sid in (0, 1, 2):
        assert os.path.exists(
            os.path.join(index_dir, "snapshots", f"snap-{sid}.json"))


def test_shared_paths_are_not_reclaimed(tmp_path):
    # two commits share a parent dir / generation subdir relationship:
    # overlap protection must keep the shared storage
    index_dir = str(tmp_path / "shared")
    cat = Catalog(index_dir)
    base = os.path.join(index_dir, "docs")
    gen1 = os.path.join(base, "gen-1")
    os.makedirs(gen1)
    with open(os.path.join(gen1, "p.parquet"), "w") as f:
        f.write("p")
    cat.commit("commit", tables={"docs": base})
    cat.commit("commit", tables={"docs": [base, gen1]})
    delete_unused_files(index_dir, KeepOnlyLastCommitDeletionPolicy())
    assert os.path.exists(os.path.join(gen1, "p.parquet"))

    # and the dead generation IS reclaimed when unshared
    dead = os.path.join(index_dir, "stats_old")
    os.makedirs(dead)
    cat2 = Catalog(str(tmp_path / "shared2"))
    live = os.path.join(str(tmp_path / "shared2"), "stats_new")
    os.makedirs(live)
    dead2 = os.path.join(str(tmp_path / "shared2"), "stats_dead")
    os.makedirs(dead2)
    cat2.commit("commit", tables={"term_stats": dead2})
    cat2.commit("commit", tables={"term_stats": live})
    rep = delete_unused_files(
        str(tmp_path / "shared2"), KeepOnlyLastCommitDeletionPolicy())
    assert not os.path.exists(dead2)
    assert os.path.exists(live)
    assert dead2 in rep["deleted_paths"]


def test_safety_fence_outside_index_dir(tmp_path):
    index_dir = str(tmp_path / "fence")
    outside = str(tmp_path / "outside_data")
    os.makedirs(outside)
    with open(os.path.join(outside, "keep.txt"), "w") as f:
        f.write("keep")
    cat = Catalog(index_dir)
    cat.commit("commit", tables={"docs": outside})
    cat.commit("commit", tables={})
    delete_unused_files(index_dir, KeepOnlyLastCommitDeletionPolicy())
    assert os.path.exists(os.path.join(outside, "keep.txt"))


def test_expired_parent_ends_chain_walk(tmp_path):
    index_dir = str(tmp_path / "walk")
    cat = Catalog(index_dir)
    cat.commit("commit", tables={})
    cat.commit("commit", tables={})
    # manually expire the parent manifest
    os.remove(os.path.join(index_dir, "snapshots", "snap-0.json"))
    assert cat.latest_at_stage("commit").snapshot_id == 1
    assert cat.load_or_none(0) is None
    with pytest.raises(FileNotFoundError):
        cat.load(0)
