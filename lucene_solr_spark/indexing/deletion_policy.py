"""Commit retention + storage reclamation: Lucene's IndexDeletionPolicy
family and the IndexFileDeleter reachability rule over the snapshot
catalog.

Reference semantics mirrored:
  - IndexDeletionPolicy (lucene/core/src/java/org/apache/lucene/index/
    IndexDeletionPolicy.java:28-87): the policy receives the full list
    of commit points sorted oldest-to-newest and flags some for
    deletion by calling commit.delete(); the writer then removes files
    no live commit references.
  - KeepOnlyLastCommitDeletionPolicy (KeepOnlyLastCommitDeletionPolicy.
    java:25-51): onInit/onCommit delete every commit except the last.
  - NoDeletionPolicy (NoDeletionPolicy.java:24-46): never deletes.
  - SnapshotDeletionPolicy (SnapshotDeletionPolicy.java:48-210): wraps
    a primary policy; snapshot() increments a per-generation refcount
    on the LAST commit and returns it, release() decrements (removing
    the pin at zero, IllegalArgumentException when the gen is not
    snapshotted :104-121); a pinned commit's delete() is a no-op
    (SnapshotCommitPoint.delete :225-236), so it survives the primary
    policy. snapshot() with no commit yet raises IllegalStateException
    (:155-162).
  - PersistentSnapshotDeletionPolicy (PersistentSnapshotDeletionPolicy.
    java:56-262): same, but the {generation: refCount} map is persisted
    to a `snapshots_<N>` file on every snapshot()/release() (save()
    :180-215 writes gen N then deletes N-1; loadPriorSnapshots()
    :241-262 reads the highest gen at construction).
  - IndexFileDeleter (IndexFileDeleter.java:66-103): per-file reference
    counting across commit points — a file is deleted exactly when the
    set of retained commits no longer references it. Here "file" is a
    snapshot table path (a parquet directory or a JSON stats file) and
    reachability is computed over the retained snapshot set, with
    prefix-aware overlap so a parent directory referenced by one
    snapshot protects generation subdirectories referenced by another.

Spark-scale note: expiry is a driver-side manifest walk (snapshot
manifests are O(generations) small JSON files — no data scan); the
actual storage reclamation deletes whole parquet directories, the same
shape as an Iceberg `expire_snapshots` action.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

from lucene_solr_spark.catalog import Catalog, Snapshot

__all__ = [
    "CommitPoint",
    "IndexDeletionPolicy",
    "KeepOnlyLastCommitDeletionPolicy",
    "NoDeletionPolicy",
    "SnapshotDeletionPolicy",
    "PersistentSnapshotDeletionPolicy",
    "delete_unused_files",
    "COMMIT_STAGES",
]

# stages a searcher can open (the segments_N analogues); docs/segments
# stages are in-flight build state, never commit points
COMMIT_STAGES = ("commit", "merge", "delete")


class CommitPoint:
    """IndexCommit analogue: a committed snapshot the policy may flag
    for deletion (IndexCommit.java:38-52, delete() contract)."""

    def __init__(self, snap: Snapshot):
        self.snap = snap
        self.deleted = False

    @property
    def generation(self) -> int:
        return self.snap.snapshot_id

    def delete(self) -> None:
        self.deleted = True

    def is_deleted(self) -> bool:
        return self.deleted


class IndexDeletionPolicy:
    """Base policy: on_commit receives commit points sorted
    oldest-to-newest (IndexDeletionPolicy.java:63-87); onInit defaults
    to the same rule, matching every built-in subclass."""

    def on_commit(self, commits: List[CommitPoint]) -> None:
        raise NotImplementedError

    def on_init(self, commits: List[CommitPoint]) -> None:
        self.on_commit(commits)


class KeepOnlyLastCommitDeletionPolicy(IndexDeletionPolicy):
    """Delete all commits except the most recent one
    (KeepOnlyLastCommitDeletionPolicy.java:40-50)."""

    def on_commit(self, commits: List[CommitPoint]) -> None:
        for commit in commits[:-1]:
            commit.delete()


class NoDeletionPolicy(IndexDeletionPolicy):
    """Keep every commit (NoDeletionPolicy.java:24-46)."""

    def on_commit(self, commits: List[CommitPoint]) -> None:
        pass


class _PinnedCommitPoint(CommitPoint):
    """SnapshotCommitPoint (SnapshotDeletionPolicy.java:216-241):
    delegates delete() only when no snapshot holds the generation."""

    def __init__(self, policy: "SnapshotDeletionPolicy",
                 inner: CommitPoint):
        self._policy = policy
        self._inner = inner
        self.snap = inner.snap

    @property
    def deleted(self) -> bool:  # type: ignore[override]
        return self._inner.deleted

    def delete(self) -> None:
        if self._policy.ref_counts.get(self.generation, 0) == 0:
            self._inner.delete()


class SnapshotDeletionPolicy(IndexDeletionPolicy):
    """Wrap a primary policy and add snapshot()/release() pinning."""

    def __init__(self, primary: Optional[IndexDeletionPolicy] = None):
        self.primary = primary or KeepOnlyLastCommitDeletionPolicy()
        self.ref_counts: Dict[int, int] = {}
        self.last_commit: Optional[CommitPoint] = None
        self._init_called = False

    # -- policy protocol ------------------------------------------------
    def on_commit(self, commits: List[CommitPoint]) -> None:
        self._init_called = True
        self.primary.on_commit(
            [_PinnedCommitPoint(self, c) for c in commits])
        if commits:
            self.last_commit = commits[-1]

    # -- pin API ----------------------------------------------------------
    def snapshot(self) -> CommitPoint:
        if not self._init_called:
            raise RuntimeError(
                "this instance is not being used by a deleter; call "
                "delete_unused_files (or on_commit) first")
        if self.last_commit is None:
            raise RuntimeError("No index commit to snapshot")
        gen = self.last_commit.generation
        self.ref_counts[gen] = self.ref_counts.get(gen, 0) + 1
        return self.last_commit

    def release(self, commit_or_gen) -> None:
        gen = (commit_or_gen.generation
               if isinstance(commit_or_gen, CommitPoint)
               else int(commit_or_gen))
        n = self.ref_counts.get(gen)
        if n is None:
            raise ValueError(
                f"commit gen={gen} is not currently snapshotted")
        if n <= 1:
            del self.ref_counts[gen]
        else:
            self.ref_counts[gen] = n - 1

    def get_snapshots(self) -> List[int]:
        return sorted(self.ref_counts)

    def get_snapshot_count(self) -> int:
        return sum(self.ref_counts.values())


SNAPSHOTS_PREFIX = "snapshots_"  # PersistentSnapshotDeletionPolicy:57


class PersistentSnapshotDeletionPolicy(SnapshotDeletionPolicy):
    """SnapshotDeletionPolicy whose pins survive process restart: the
    refcount map is written to `<snap_dir>/snapshots_<N>` after every
    snapshot()/release() (save() rotates: write gen N, delete N-1) and
    the highest generation is loaded at construction."""

    def __init__(self, index_dir: str,
                 primary: Optional[IndexDeletionPolicy] = None):
        super().__init__(primary)
        self._dir = os.path.join(index_dir, "snapshots")
        os.makedirs(self._dir, exist_ok=True)
        self._next_write_gen = 0
        self._load_prior_snapshots()

    def snapshot(self) -> CommitPoint:
        ic = super().snapshot()
        try:
            self._save()
        except Exception:
            super().release(ic)  # :126-140 roll back the pin on IO error
            raise
        return ic

    def release(self, commit_or_gen) -> None:
        super().release(commit_or_gen)
        self._save()

    def _save(self) -> None:
        path = os.path.join(
            self._dir, SNAPSHOTS_PREFIX + str(self._next_write_gen))
        with open(path, "w") as f:
            json.dump({str(g): n for g, n in self.ref_counts.items()}, f)
            f.flush()
            os.fsync(f.fileno())
        if self._next_write_gen > 0:
            prior = os.path.join(
                self._dir, SNAPSHOTS_PREFIX + str(self._next_write_gen - 1))
            if os.path.exists(prior):
                os.remove(prior)
        self._next_write_gen += 1

    def _load_prior_snapshots(self) -> None:
        gens = []
        for name in os.listdir(self._dir):
            if name.startswith(SNAPSHOTS_PREFIX):
                try:
                    gens.append(int(name[len(SNAPSHOTS_PREFIX):]))
                except ValueError:
                    continue
        if not gens:
            return
        gen = max(gens)
        with open(os.path.join(self._dir, SNAPSHOTS_PREFIX + str(gen))) as f:
            self.ref_counts = {int(g): int(n)
                               for g, n in json.load(f).items()}
        self._next_write_gen = gen + 1


# ---------------------------------------------------------------------------
# IndexFileDeleter analogue
# ---------------------------------------------------------------------------

def _table_paths(snap: Snapshot) -> List[str]:
    out: List[str] = []
    for v in snap.tables.values():
        if isinstance(v, (list, tuple)):
            out.extend(str(p) for p in v)
        else:
            out.append(str(v))
    return out


def _overlaps(a: str, b: str) -> bool:
    """True when a and b name the same path or one contains the other."""
    a, b = a.rstrip(os.sep), b.rstrip(os.sep)
    return a == b or a.startswith(b + os.sep) or b.startswith(a + os.sep)


def delete_unused_files(index_dir: str,
                        policy: IndexDeletionPolicy) -> dict:
    """Run the retention policy over the catalog's commit points, then
    physically remove (a) the manifests of expired snapshots and (b)
    every table path referenced ONLY by expired snapshots — the
    IndexFileDeleter decref-to-zero rule (IndexFileDeleter.java:66-103)
    computed as set reachability over the retained snapshot set.

    Protection invariants (never deleted, regardless of policy):
      - the chain from LATEST back to the first commit point at or
        below it — an in-flight build's docs/segments snapshots stay
        resumable, and the live commit can never expire;
      - any path outside index_dir (safety fence);
      - any path that overlaps (same/ancestor/descendant) a retained
        snapshot's path.
    """
    cat = Catalog(index_dir)
    latest = cat.latest()
    if latest is None:
        return {"deleted_snapshots": [], "deleted_paths": [],
                "retained_snapshots": []}

    # load the whole generation chain (oldest first)
    chain: List[Snapshot] = []
    s: Optional[Snapshot] = latest
    while s is not None:
        chain.append(s)
        s = None if s.parent is None else cat.load_or_none(s.parent)
    chain.reverse()

    # protected: LATEST down to the first commit point (inclusive)
    protected = set()
    for s in reversed(chain):
        protected.add(s.snapshot_id)
        if s.stage in COMMIT_STAGES:
            break

    commits = [CommitPoint(s) for s in chain if s.stage in COMMIT_STAGES]
    policy.on_commit(commits)
    dropped_commit_gens = {
        c.generation for c in commits
        if c.deleted and c.generation not in protected
    }
    newest_commit_gen = commits[-1].generation if commits else -1

    retained: List[Snapshot] = []
    dropped: List[Snapshot] = []
    for s in chain:
        if s.snapshot_id in protected:
            retained.append(s)
        elif s.snapshot_id in dropped_commit_gens:
            dropped.append(s)
        elif s.stage not in COMMIT_STAGES:
            # intermediate build state below the newest commit point is
            # dead weight once a commit landed above it
            if s.snapshot_id < newest_commit_gen:
                dropped.append(s)
            else:
                retained.append(s)
        else:
            retained.append(s)

    live_paths = set()
    for s in retained:
        live_paths.update(_table_paths(s))

    root = os.path.abspath(index_dir)
    deleted_paths: List[str] = []
    seen = set()
    for s in dropped:
        for p in _table_paths(s):
            ap = os.path.abspath(p)
            if ap in seen:
                continue
            seen.add(ap)
            if not ap.startswith(root + os.sep):
                continue
            if any(_overlaps(ap, os.path.abspath(lp))
                   for lp in live_paths):
                continue
            if os.path.isdir(ap):
                shutil.rmtree(ap, ignore_errors=True)
                deleted_paths.append(ap)
            elif os.path.exists(ap):
                os.remove(ap)
                deleted_paths.append(ap)

    # Manifest (snap-N.json) deletion must preserve parent-chain
    # contiguity: every retained snapshot must stay reachable from
    # LATEST, so a dropped snapshot's manifest is removable only when
    # NO retained snapshot is older than it (otherwise it stays as a
    # chain link while its unshared data paths are reclaimed above —
    # Lucene's segments_N files are chain-free so it has no such
    # constraint, IndexFileDeleter.java:66-103).
    oldest_retained = min(s.snapshot_id for s in retained)
    deleted_snaps = []
    for s in dropped:
        if s.snapshot_id > oldest_retained:
            continue
        mp = os.path.join(cat.snap_dir, f"snap-{s.snapshot_id}.json")
        if os.path.exists(mp):
            os.remove(mp)
        deleted_snaps.append(s.snapshot_id)

    return {
        "deleted_snapshots": sorted(deleted_snaps),
        "deleted_paths": sorted(deleted_paths),
        "retained_snapshots": sorted(s.snapshot_id for s in retained),
    }
