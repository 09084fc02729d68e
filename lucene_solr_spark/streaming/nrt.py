"""NRT (near-real-time) indexing: Structured Streaming micro-batches
appended as index generations.

Reference semantics being mirrored (SURVEY.md section 2.10):
  - NRT reader sees flushed-but-uncommitted segments
    (DirectoryReader.open(writer), index/StandardDirectoryReader.java;
    SearcherManager.java) -> here: every micro-batch IS a committed
    snapshot generation; a new IndexSearcher sees snapshot-latest.
  - soft/hard commit split (solr/core/.../update/DirectUpdateHandler2
    .java, UpdateLog.java tlog) -> the streaming checkpointLocation is
    the tlog analogue: after a crash, Spark replays the unacknowledged
    micro-batch and append_documents' updateDocuments semantics
    (delete-then-add by (repo, path, commit)) make the replay
    idempotent at the key level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lucene_solr_spark.indexing.build import append_documents, maybe_compact


def start_nrt_indexer(
    spark: SparkSession,
    index_dir: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    compact_after: int = 10,
    hard_commit_tracker=None,
    batch_time_ms: int = 1000,
    **trigger_kwargs,
):
    """Attach an NRT indexing sink to a streaming corpus DataFrame
    (columns: repo, path, commit, lang, content). Each micro-batch is
    appended via append_documents (new docID range, new segments, stats
    delta, replaced keys tombstoned). Returns the StreamingQuery.

    ``hard_commit_tracker`` (a streaming.committracker.CommitTracker)
    maps Solr's soft/hard autocommit split onto this sink: every
    micro-batch append IS the soft commit (visible to a fresh
    searcher, like openSearcher soft commits), while the tracker's
    maxDocs/maxTime policy decides when the HARD boundary work —
    generation compaction — runs. The tracker's clock is logical:
    each micro-batch advances it by ``batch_time_ms``, so the policy
    is deterministic under checkpoint replay (a wall clock would
    fire differently on replay and break idempotence). Without a
    tracker, compaction gates only on generation count
    (compact_after), the prior behavior.

    trigger_kwargs pass through to ``writeStream.trigger`` (e.g.
    ``availableNow=True`` for drain-and-stop, ``processingTime='10
    seconds'`` for continuous micro-batching)."""
    if hard_commit_tracker is not None and hard_commit_tracker.on_commit is None:
        hard_commit_tracker.on_commit = lambda t: maybe_compact(
            spark, index_dir, max_generations=1)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_documents(spark, index_dir, batch_df)
        if hard_commit_tracker is not None:
            # count() only when a tracker consumes it — the default
            # streaming path otherwise pays a full extra batch job
            n = batch_df.count()
            now = batch_id * batch_time_ms
            for _ in range(n):
                hard_commit_tracker.added_document(now=now)
            hard_commit_tracker.tick(now + batch_time_ms)
        elif compact_after:
            # background-merge analogue (ConcurrentMergeScheduler +
            # TieredMergePolicy): bound the generation count so query
            # row counts stay flat under continuous ingestion
            maybe_compact(spark, index_dir, max_generations=compact_after)

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_kwargs:
        writer = writer.trigger(**trigger_kwargs)
    return writer.start()
