"""Snapshot catalog: the Lucene `segments_N` / Iceberg-snapshot model
re-expressed over parquet + JSON manifests.

Reference semantics being mirrored (SURVEY.md section 1.2):
  - an index is immutable segment data + a generational manifest; the
    largest committed generation is live (lucene/core/src/java/org/
    apache/lucene/index/SegmentInfos.java:52-72,129-134)
  - commits are atomic pointer swaps (IndexWriter.prepareCommit/commit,
    IndexWriter.java:2662,2820) — here: write snap-<N>.json, fsync-ish,
    then atomically rename a tmp LATEST pointer
  - snapshot user data == lineage rows: per build partition we record
    (partition_id, term_range_lo/hi, doc_count, bytes, input_sha256,
    snapshot_id, ts) per the north rule; resume = read latest snapshot,
    skip batches whose lineage is already committed.

Why not real Apache Iceberg: the sandbox has no Iceberg runtime jars and
no network; the catalog below keeps the same contract (immutable files,
atomic generation pointer, snapshot properties) behind a ~150-line
module, and swaps for an Iceberg catalog by replacing read/write paths
with `spark.read.format("iceberg")` + snapshot IDs on a real cluster.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

__all__ = ["Catalog", "Snapshot"]


@dataclass
class Snapshot:
    snapshot_id: int
    stage: str  # docs | segments | commit | merge
    parent: Optional[int]
    tables: Dict[str, str] = field(default_factory=dict)
    props: Dict[str, Any] = field(default_factory=dict)
    lineage: List[dict] = field(default_factory=list)
    ts: float = 0.0

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "stage": self.stage,
            "parent": self.parent,
            "tables": self.tables,
            "props": self.props,
            "lineage": self.lineage,
            "ts": self.ts,
        }

    @classmethod
    def from_json(cls, d: dict) -> "Snapshot":
        return cls(**d)


class Catalog:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.snap_dir = os.path.join(index_dir, "snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- paths ----------------------------------------------------------
    def path(self, *parts: str) -> str:
        return os.path.join(self.index_dir, *parts)

    # -- snapshot IO ------------------------------------------------------
    def _latest_path(self) -> str:
        return os.path.join(self.snap_dir, "LATEST")

    def latest_id(self) -> Optional[int]:
        p = self._latest_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def load(self, snapshot_id: int) -> Snapshot:
        with open(os.path.join(self.snap_dir, f"snap-{snapshot_id}.json")) as f:
            return Snapshot.from_json(json.load(f))

    def load_or_none(self, snapshot_id: int) -> Optional[Snapshot]:
        """load(), but an expired (deleted) manifest ends the chain —
        the Lucene reading of a segments_N removed by the deletion
        policy (IndexFileDeleter decref) rather than an error."""
        try:
            return self.load(snapshot_id)
        except FileNotFoundError:
            return None

    def latest(self) -> Optional[Snapshot]:
        sid = self.latest_id()
        return None if sid is None else self.load(sid)

    def latest_at_stage(self, *stages: str) -> Optional[Snapshot]:
        """Walk the parent chain from the live snapshot to the most
        recent snapshot at one of `stages` (snapshot-as-of semantics).
        The walk ends at the first expired parent manifest."""
        snap = self.latest()
        while snap is not None:
            if snap.stage in stages:
                return snap
            snap = (None if snap.parent is None
                    else self.load_or_none(snap.parent))
        return None

    def commit(
        self,
        stage: str,
        tables: Dict[str, str],
        props: Optional[Dict[str, Any]] = None,
        lineage: Optional[List[dict]] = None,
    ) -> Snapshot:
        """Durable 2-phase publish: snap file first, LATEST pointer
        swapped by atomic rename second (prepareCommit/commit analogue).
        A crash between the two leaves the old generation live."""
        parent = self.latest_id()
        sid = 0 if parent is None else parent + 1
        snap = Snapshot(
            snapshot_id=sid,
            stage=stage,
            parent=parent,
            tables=dict(tables),
            props=dict(props or {}),
            lineage=list(lineage or []),
            ts=time.time(),
        )
        snap_path = os.path.join(self.snap_dir, f"snap-{sid}.json")
        with open(snap_path, "w") as f:
            json.dump(snap.to_json(), f)
            f.flush()
            os.fsync(f.fileno())
        tmp = self._latest_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(sid))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._latest_path())
        return snap
