"""CommitTracker (solr/update/CommitTracker.java:46-223) — the
autocommit policy rules, hand-traced, plus the NRT-sink wiring."""

from lucene_solr_spark.streaming.committracker import CommitTracker


def test_maxdocs_triggers_once_on_the_way_up():
    """:157-166 — fires at docsUpperBound + 1 (the == comparison),
    counter resets immediately, one commit per crossing."""
    fired = []
    t = CommitTracker(docs_upper_bound=3,
                      on_commit=lambda tr: fired.append(tr.auto_commit_count))
    for i in range(4):           # docs 1..4: fire armed at the 4th
        t.added_document(now=0)
    assert t.pending_deadline == 0 + CommitTracker.DOC_COMMIT_DELAY_MS
    assert t.docs_since_commit == 0           # reset at arm time
    assert t.tick(5) and fired == [1]
    assert not t.tick(6)                      # pending cleared
    # next crossing needs another docsUpperBound + 1 adds
    for _ in range(3):
        t.added_document(now=10)
    assert t.pending_deadline is None
    t.added_document(now=10)
    assert t.pending_deadline == 11


def test_maxtime_and_commit_within_override():
    """:121-127 — commitWithin > 0 overrides timeUpperBound; 0 falls
    back to the bound; both <= 0 never arms."""
    t = CommitTracker(time_upper_bound=100)
    t.added_document(commit_within=0, now=1000)
    assert t.pending_deadline == 1100
    t2 = CommitTracker(time_upper_bound=100)
    t2.added_document(commit_within=30, now=1000)
    assert t2.pending_deadline == 1030
    t3 = CommitTracker()                      # both disabled
    t3.added_document(now=0)
    t3.deleted_document(now=0)
    assert t3.pending_deadline is None


def test_pending_earlier_wins_rule():
    """:133-151 — a pending commit firing first is kept; a later
    deadline is replaced by an earlier request."""
    t = CommitTracker(time_upper_bound=100)
    t.added_document(now=0)                   # deadline 100
    t.added_document(commit_within=500, now=50)   # would be 550: kept 100
    assert t.pending_deadline == 100
    t.added_document(commit_within=20, now=50)    # 70 < 100: resched
    assert t.pending_deadline == 70


def test_deleted_document_arms_time_only():
    t = CommitTracker(docs_upper_bound=1, time_upper_bound=100)
    t.deleted_document(now=0)
    assert t.docs_since_commit == 0 and t.pending_deadline == 100


def test_rollback_cancels_and_resets():
    t = CommitTracker(docs_upper_bound=10, time_upper_bound=100)
    t.added_document(now=0)
    assert t.pending_deadline is not None
    t.did_rollback()
    assert t.pending_deadline is None and t.docs_since_commit == 0


def test_run_clears_pending_before_callback():
    """:196-199 — a new commit can be scheduled from inside the
    current one; count increments before the callback."""
    t = CommitTracker(time_upper_bound=50)

    def reschedule(tr):
        assert tr.pending_deadline is None
        assert tr.auto_commit_count == 1
        tr.schedule_commit_within(50, now=100)

    t.on_commit = reschedule
    t.added_document(now=0)
    assert t.tick(100)
    assert t.pending_deadline == 150


def test_nrt_sink_with_hard_commit_tracker(spark, tmp_path):
    """Soft/hard split through the sink: every micro-batch is visible
    (soft), the tracker's maxDocs policy fires the hard-boundary
    compaction. 40 docs with docsUpperBound=25 -> exactly one
    autocommit, and the searcher sees all docs either way."""
    import sys
    sys.path.insert(0, "tests")
    from test_deletes_appends import CORPUS_SCHEMA, corpus_rows, row

    from lucene_solr_spark.indexing.build import IndexWriter
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.streaming.nrt import start_nrt_indexer

    index_dir = str(tmp_path / "nrtidx")
    stream_src = str(tmp_path / "stream_in")
    checkpoint = str(tmp_path / "ckpt")
    first = spark.createDataFrame(corpus_rows(80), schema=CORPUS_SCHEMA)
    IndexWriter(spark, index_dir, docs_per_segment=64, n_batches=1).build(
        first)
    batch = spark.createDataFrame(
        [row(i) for i in range(80, 120)], schema=CORPUS_SCHEMA)
    batch.write.mode("overwrite").parquet(stream_src)
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(stream_src)
    tracker = CommitTracker("hard", docs_upper_bound=25)
    q = start_nrt_indexer(
        spark, index_dir, stream, checkpoint,
        hard_commit_tracker=tracker, availableNow=True)
    q.awaitTermination(120)
    assert tracker.get_commit_count() == 1
    assert IndexSearcher(spark, index_dir).max_doc == 120
