"""LogMergePolicy family: logarithmic level-based merge selection and
its execution over postings storage generations.

Reference semantics mirrored:
  - LogMergePolicy.findMerges (lucene/core/src/java/org/apache/lucene/
    index/LogMergePolicy.java:464-596): per-segment level =
    f32(ln(max(size,1))) / f32(ln(mergeFactor)) (f32 division, :474,
    :487); the level floor is f32(ln(minMergeSize)/norm) (:500-504);
    levels are quantized outer-to-inner — find the max level of the
    unquantized tail, search BACKWARDS for the rightmost segment
    within LEVEL_LOG_SPAN=0.75 of it (forced boundary at the floor,
    :532-543), then emit positional windows of exactly mergeFactor
    segments inside [start, upto] (:556-590); a window containing a
    segment with size >= maxMergeSize or docs >= maxMergeDocs is
    skipped but still consumed (:559-589 anyTooLarge).
  - LogDocMergePolicy (LogDocMergePolicy.java:25-31): size = doc
    count, DEFAULT_MIN_MERGE_DOCS = 1000.
  - LogByteSizeMergePolicy (LogByteSizeMergePolicy.java:26-42):
    size = bytes, min 1.6 MB, max 2048 MB, maxMergeDocs unlimited.

Execution here (compact_generations) applies the selection at the
storage-GENERATION granularity of this engine: every NRT append adds
one postings generation (indexing/build.py append_documents), the
read path unions the live generations (read_postings_any), and a
selected run of small adjacent generations is rewritten as ONE plain
postings generation — rows unchanged (concat-only, the same
invariant as merge_postings), so search results are identical by
construction while read amplification drops logarithmically, which
is exactly the reference policy's goal. The salted re-grouping merge
(merge_postings, group_factor growth) remains the forceMerge
analogue; this is the background findMerges path.

Scale note: selection is a driver-side walk over O(generations)
sizes (the reference walks SegmentInfos on one node the same way);
the rewrite is one columnar scan+write of ONLY the selected
generations — small ones by construction — never the whole index.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from pyspark.sql import SparkSession

from lucene_solr_spark.catalog import Catalog, Snapshot

__all__ = [
    "find_merges",
    "LogDocMergePolicy",
    "LogByteSizeMergePolicy",
    "compact_generations",
    "LEVEL_LOG_SPAN",
    "DEFAULT_MERGE_FACTOR",
]

LEVEL_LOG_SPAN = 0.75       # LogMergePolicy.java:55
DEFAULT_MERGE_FACTOR = 10   # :59
_F32 = np.float32


def find_merges(
    sizes: Sequence[int],
    merge_factor: int = DEFAULT_MERGE_FACTOR,
    min_merge_size: int = 0,
    max_merge_size: Optional[int] = None,
    doc_counts: Optional[Sequence[int]] = None,
    max_merge_docs: Optional[int] = None,
) -> List[Tuple[int, int]]:
    """LogMergePolicy.findMerges(:464-596) over positional sizes.
    Returns [start, end) index windows, in emission order. ``sizes``
    feeds the level math and the maxMergeSize gate; ``doc_counts``
    (defaults to ``sizes``) feeds the maxMergeDocs gate."""
    n = len(sizes)
    if doc_counts is None:
        doc_counts = sizes
    norm = _F32(np.log(float(merge_factor)))
    levels = [
        _F32(np.log(float(max(int(s), 1)))) / norm for s in sizes
    ]
    if min_merge_size <= 0:
        level_floor = _F32(0.0)
    else:
        level_floor = _F32(float(np.log(float(min_merge_size))) / norm)

    out: List[Tuple[int, int]] = []
    start = 0
    while start < n:
        max_level = levels[start]
        for i in range(start + 1, n):
            if levels[i] > max_level:
                max_level = levels[i]

        if max_level <= level_floor:
            level_bottom = _F32(-1.0)
        else:
            level_bottom = _F32(float(max_level) - LEVEL_LOG_SPAN)
            if level_bottom < level_floor and max_level >= level_floor:
                level_bottom = level_floor

        upto = n - 1
        while upto >= start:
            if levels[upto] >= level_bottom:
                break
            upto -= 1

        end = start + merge_factor
        while end <= 1 + upto:
            any_too_large = False
            for i in range(start, end):
                if ((max_merge_size is not None
                     and int(sizes[i]) >= max_merge_size)
                        or (max_merge_docs is not None
                            and int(doc_counts[i]) >= max_merge_docs)):
                    any_too_large = True
            if not any_too_large:
                out.append((start, end))
            start = end
            end = start + merge_factor
        start = 1 + upto
    return out


class LogDocMergePolicy:
    """LogDocMergePolicy.java:25-37 — size() = doc count."""

    DEFAULT_MIN_MERGE_DOCS = 1000

    def __init__(self, merge_factor: int = DEFAULT_MERGE_FACTOR,
                 min_merge_docs: int = DEFAULT_MIN_MERGE_DOCS,
                 max_merge_docs: Optional[int] = None):
        self.merge_factor = merge_factor
        self.min_merge_size = min_merge_docs
        self.max_merge_docs = max_merge_docs

    def find_merges(self, doc_counts: Sequence[int]
                    ) -> List[Tuple[int, int]]:
        return find_merges(
            doc_counts, self.merge_factor, self.min_merge_size,
            max_merge_size=None, doc_counts=doc_counts,
            max_merge_docs=self.max_merge_docs)


class LogByteSizeMergePolicy:
    """LogByteSizeMergePolicy.java:26-42 — size() = bytes."""

    DEFAULT_MIN_MERGE_MB = 1.6
    DEFAULT_MAX_MERGE_MB = 2048.0

    def __init__(self, merge_factor: int = DEFAULT_MERGE_FACTOR,
                 min_merge_mb: float = DEFAULT_MIN_MERGE_MB,
                 max_merge_mb: float = DEFAULT_MAX_MERGE_MB):
        self.merge_factor = merge_factor
        self.min_merge_size = int(min_merge_mb * 1024 * 1024)
        self.max_merge_size = int(max_merge_mb * 1024 * 1024)

    def find_merges(self, sizes: Sequence[int]) -> List[Tuple[int, int]]:
        return find_merges(
            sizes, self.merge_factor, self.min_merge_size,
            max_merge_size=self.max_merge_size)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def compact_generations(
    spark: SparkSession, index_dir: str,
    policy: Optional[LogByteSizeMergePolicy] = None,
) -> Optional[Snapshot]:
    """Run a log merge policy over the live postings GENERATIONS and
    rewrite each selected contiguous run as one plain postings
    generation (rows unchanged — concat-only, like merge_postings).
    Returns the new snapshot, or None when the policy found nothing.
    Generation sizes are on-disk bytes (the sizeBytes() analogue);
    segment meta and docs tables are untouched, so scores and results
    are bit-identical before/after."""
    from lucene_solr_spark.indexing.build import (
        _as_list, read_postings_any)

    if policy is None:
        policy = LogByteSizeMergePolicy()
    cat = Catalog(index_dir)
    snap = cat.latest_at_stage("commit", "merge", "delete")
    if snap is None:
        return None
    gens = _as_list(snap.tables["postings"])
    merges = policy.find_merges([_dir_bytes(p) for p in gens])
    if not merges:
        return None
    gen = snap.snapshot_id + 1
    new_list: List[str] = []
    pos = 0
    par = spark.sparkContext.defaultParallelism
    for k, (mstart, mend) in enumerate(merges):
        new_list.extend(gens[pos:mstart])
        out_path = cat.path("merged", f"loggen-{gen}-{k}")
        (
            read_postings_any(spark, gens[mstart:mend])
            .repartitionByRange(par, "term", "seg_id")
            .sortWithinPartitions("term", "seg_id")
            .write.mode("overwrite").parquet(out_path)
        )
        new_list.append(out_path)
        pos = mend
    new_list.extend(gens[pos:])
    tables = dict(snap.tables)
    tables["postings"] = new_list
    return cat.commit(
        "merge",
        tables=tables,
        props=dict(snap.props),
        lineage=snap.lineage,
    )
