"""Index replication: point-in-time replicas of a committed snapshot.

Re-expresses `lucene/replicator` (IndexRevision.java — a revision is
the commit's immutable file set; IndexReplicationHandler.java — copy
the revision's files, then publish the segments file LAST so a reader
never observes a partial generation; ReplicationClient.java — pull
only files the replica does not already have).

The engine analogue: a snapshot generation's data files are immutable
(generation-specific paths, catalog.py), so replication is

  1. copy every data file referenced by the source snapshot chain that
     the replica is missing (same relative path + size => skip —
     the incremental pull),
  2. copy the snapshot manifests with table paths rewritten to the
     replica root,
  3. atomically publish LATEST (os.replace) — the IndexReplication
     Handler publish-last rule, so a concurrent reader of the replica
     always opens a complete generation.

Pure filesystem: no Spark job. On a real cluster the same sequence
runs against the object store (immutable parquet + manifest swap).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from lucene_solr_spark.catalog import Catalog


def _rewrite(obj: Any, src: str, dst: str) -> Any:
    if isinstance(obj, str):
        return dst + obj[len(src):] if obj.startswith(src) else obj
    if isinstance(obj, list):
        return [_rewrite(v, src, dst) for v in obj]
    if isinstance(obj, dict):
        return {k: _rewrite(v, src, dst) for k, v in obj.items()}
    return obj


def _iter_files(path: str):
    if os.path.isfile(path):
        yield path
    for root, _dirs, files in os.walk(path):
        for fn in files:
            yield os.path.join(root, fn)


def replicate(src_dir: str, dst_dir: str) -> dict:
    """Replicate the LATEST committed snapshot (and its parent chain,
    for resume/as-of semantics) from ``src_dir`` to ``dst_dir``.
    Incremental and idempotent. Returns copy statistics."""
    src_dir = os.path.realpath(src_dir)
    dst_dir = os.path.realpath(dst_dir)
    scat = Catalog(src_dir)
    sid = scat.latest_id()
    if sid is None:
        raise RuntimeError(f"no committed snapshot in {src_dir}")

    # collect the snapshot chain and every referenced data path
    chain = []
    snap = scat.latest()
    while snap is not None:
        chain.append(snap)
        snap = (None if snap.parent is None
                else scat.load_or_none(snap.parent))
    data_paths: list = []
    for s in chain:
        for v in s.tables.values():
            data_paths.extend(v if isinstance(v, list) else [v])

    copied = skipped = bytes_copied = 0
    for p in dict.fromkeys(data_paths):  # dedup, keep order
        if not os.path.exists(p):
            continue  # superseded generation already vacuumed
        for f in _iter_files(p):
            rel = os.path.relpath(f, src_dir)
            out = os.path.join(dst_dir, rel)
            if os.path.exists(out) and \
                    os.path.getsize(out) == os.path.getsize(f):
                skipped += 1
                continue
            os.makedirs(os.path.dirname(out), exist_ok=True)
            shutil.copy2(f, out)
            copied += 1
            bytes_copied += os.path.getsize(f)

    # manifests with rewritten paths, oldest first; LATEST published last
    dcat = Catalog(dst_dir)  # creates snapshots/ dir
    for s in reversed(chain):
        d = _rewrite(s.to_json(), src_dir, dst_dir)
        snap_path = os.path.join(dcat.snap_dir, f"snap-{s.snapshot_id}.json")
        with open(snap_path, "w") as f:
            json.dump(d, f)
            f.flush()
            os.fsync(f.fileno())
    tmp = dcat._latest_path() + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(sid))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dcat._latest_path())
    return {"snapshot_id": sid, "files_copied": copied,
            "files_skipped": skipped, "bytes_copied": bytes_copied}
