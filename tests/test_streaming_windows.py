"""Event-time streaming gates: watermarked tumbling windows and the
applyInPandasWithState sessionizer (lucene_solr_spark/streaming/
windows.py) against their batch twins.

The reference has no event-time semantics (SURVEY §2.10) — these are
the engine's Structured-Streaming extensions, so the oracle here is
the BATCH plan (itself DuckDB-gated via the event_window_counts /
event_sessions entries), plus the late-data drop contract."""

import os
import time

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from lucene_solr_spark.streaming.windows import (
    run_stream_to_memory,
    sessionize_batch,
    sessionize_stream,
    windowed_counts_batch,
    windowed_counts_stream,
)

EVENT_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def _synth_events(spark, n=4000, users=20, seed=7):
    """Deterministic event stream: ~2.2-minute mean spacing so 15-min
    windows hold a handful of rows and 30-min session gaps occur."""
    import numpy as np

    rng = np.random.RandomState(seed)
    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00
    gaps = rng.exponential(scale=130.0, size=n)  # seconds
    ts_us = base_us + (np.cumsum(gaps) * 1e6).astype("int64")
    rows = [
        (int(i), ts, int(rng.randint(0, users)),
         ["view", "click", "error"][int(rng.randint(0, 3))],
         float(round(rng.uniform(0, 50), 2)))
        for i, ts in enumerate(ts_us)
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
    return spark.createDataFrame(pdf, schema=EVENT_SCHEMA)


def _session_tz(spark):
    import pandas as pd  # noqa: F401

    tz = spark.conf.get("spark.sql.session.timeZone", None)
    if not tz:
        import datetime

        tz = datetime.datetime.now().astimezone().tzname() or "UTC"
    return tz


def _write_pdf(pdf, path, tz):
    # mark the wall-clock values with the session zone so parquet
    # stores isAdjustedToUTC=true and Spark reads TIMESTAMP (ltz)
    out = pdf.copy()
    out["ts"] = out["ts"].dt.tz_localize(tz)
    # micros, not pandas' default nanos — Spark's TIMESTAMP is micros
    out.to_parquet(path, index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True)


def _write_chrono_files(spark, df, out_dir, k=4):
    """Split a finite event set into k chronological parquet files with
    strictly increasing mtimes, so FileStreamSource (oldest-first)
    replays them as k in-order micro-batches."""
    tz = _session_tz(spark)
    pdf = df.toPandas().sort_values("ts").reset_index(drop=True)
    os.makedirs(out_dir, exist_ok=True)
    step = (len(pdf) + k - 1) // k
    now = time.time() - 3600
    paths = []
    for i in range(k):
        chunk = pdf.iloc[i * step:(i + 1) * step]
        p = os.path.join(out_dir, f"part-{i:03d}.parquet")
        _write_pdf(chunk, p, tz)
        os.utime(p, (now + i * 60, now + i * 60))
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evstream"))
    df = _synth_events(spark)
    _write_chrono_files(spark, df, d, k=4)
    return d, df


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_counts_stream_matches_batch_finalized(spark, stream_src):
    src_dir, events = stream_src
    run_stream_to_memory(
        windowed_counts_stream(spark, src_dir, EVENT_SCHEMA), "wc_sink")
    streamed = spark.table("wc_sink")
    batch = windowed_counts_batch(events)

    cols = ["window_start", "event_type", "n_events", "value_cents"]
    got = _rows(streamed, cols)
    want_all = _rows(batch, cols)
    # append mode emits only windows finalized by the final watermark;
    # every emitted row must equal its batch twin exactly
    assert set(got) <= set(want_all)
    # and all but the tail of the stream must have been finalized:
    # everything strictly older than the last window could emit
    max_emitted = max(r[0] for r in got)
    missing = [r for r in want_all if r not in set(got)
               and r[0] < max_emitted]
    assert missing == []
    assert len(got) >= len(want_all) // 2


def test_windowed_counts_late_row_dropped(spark, tmp_path):
    """A row arriving after the watermark passed its window is DROPPED
    from the (already finalized) aggregation — the late-data contract;
    the batch plan, with no arrival-order notion, counts it."""
    import pandas as pd

    d = str(tmp_path / "late")
    os.makedirs(d)
    t0 = pd.Timestamp("2024-01-01 00:05:00")
    early = pd.DataFrame({
        "event_id": [0, 1, 2],
        "ts": [t0, t0 + pd.Timedelta(minutes=2),
               t0 + pd.Timedelta(hours=3)],
        "user_id": [1, 1, 1],
        "event_type": ["view"] * 3,
        "value": [1.0, 1.0, 1.0],
    })
    # spacer batch: the first window is finalized (evicted + emitted)
    # at the END of the batch where the watermark passes its end, so
    # the late row must arrive in a LATER batch to hit a closed window
    spacer = pd.DataFrame({
        "event_id": [5],
        "ts": [t0 + pd.Timedelta(hours=3, minutes=10)],
        "user_id": [1],
        "event_type": ["view"],
        "value": [1.0],
    })
    # late row: same window as the first two, arriving after the
    # watermark (3h - 20min) finalized that window
    late = pd.DataFrame({
        "event_id": [3, 4],
        "ts": [t0 + pd.Timedelta(minutes=1),
               t0 + pd.Timedelta(hours=3, minutes=40)],
        "user_id": [1, 1],
        "event_type": ["view"] * 2,
        "value": [1.0, 1.0],
    })
    now = time.time() - 3600
    tz = _session_tz(spark)
    for i, chunk in enumerate((early, spacer, late)):
        p = os.path.join(d, f"part-{i:03d}.parquet")
        _write_pdf(chunk, p, tz)
        os.utime(p, (now + i * 60, now + i * 60))

    run_stream_to_memory(
        windowed_counts_stream(spark, d, EVENT_SCHEMA), "late_sink")
    streamed = {r["window_start"]: r["n_events"]
                for r in spark.table("late_sink").collect()}
    first_window = pd.Timestamp("2024-01-01 00:00:00")
    # batch would say 3 (events 0,1,3); the stream finalized the window
    # at 2 and dropped the late arrival
    assert streamed[first_window] == 2

    batch = windowed_counts_batch(
        spark.read.schema(EVENT_SCHEMA).parquet(d))
    bmap = {r["window_start"]: r["n_events"] for r in batch.collect()}
    assert bmap[first_window] == 3


def test_sessionize_stream_matches_batch_minus_open(spark, stream_src):
    src_dir, events = stream_src
    run_stream_to_memory(
        sessionize_stream(spark, src_dir, EVENT_SCHEMA), "sess_sink")
    streamed = spark.table("sess_sink")
    batch = sessionize_batch(events)

    cols = ["user_id", "session_start", "session_end",
            "n_events", "value_cents"]
    got = _rows(streamed, cols)
    want = _rows(batch, cols)
    # the stream emits a session once a later same-user event proves it
    # closed; each user's LAST session never closes inside the finite
    # stream and stays in state — so stream == batch minus per-user max
    last_per_user = {}
    for r in want:
        if r[0] not in last_per_user or r[1] > last_per_user[r[0]][1]:
            last_per_user[r[0]] = r
    want_closed = [r for r in want if last_per_user[r[0]] != r]
    assert got == sorted(want_closed)
    # sanity: the test stream actually exercises multi-session users
    assert len(want_closed) > len(last_per_user)


def test_sessionize_stream_state_survives_batches(spark, tmp_path):
    """A session straddling micro-batch boundaries must come out as ONE
    session (state carries the open session across batches)."""
    import pandas as pd

    d = str(tmp_path / "straddle")
    os.makedirs(d)
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    mk = lambda eid, mins: {
        "event_id": eid, "ts": t0 + pd.Timedelta(minutes=mins),
        "user_id": 5, "event_type": "view", "value": 1.0}
    b1 = pd.DataFrame([mk(0, 0), mk(1, 10)])
    b2 = pd.DataFrame([mk(2, 20), mk(3, 120), mk(4, 125)])
    now = time.time() - 3600
    tz = _session_tz(spark)
    for i, chunk in enumerate((b1, b2)):
        p = os.path.join(d, f"part-{i:03d}.parquet")
        _write_pdf(chunk, p, tz)
        os.utime(p, (now + i * 60, now + i * 60))

    run_stream_to_memory(
        sessionize_stream(spark, d, EVENT_SCHEMA), "straddle_sink")
    got = spark.table("straddle_sink").collect()
    # exactly one CLOSED session: events 0-2 spanning both batches
    # (events 3-4 stay open in state)
    assert len(got) == 1
    r = got[0]
    assert (r["n_events"], r["value_cents"]) == (3, 300)
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + pd.Timedelta(minutes=20)


def test_sessionize_stream_out_of_order_within_gap(spark, tmp_path):
    """A cross-batch event slightly OLDER than the open session's end
    (but within the gap) must extend membership without moving the
    session end backwards or splitting the session."""
    import pandas as pd

    d = str(tmp_path / "ooo")
    os.makedirs(d)
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    mk = lambda eid, mins: {
        "event_id": eid, "ts": t0 + pd.Timedelta(minutes=mins),
        "user_id": 9, "event_type": "view", "value": 1.0}
    b1 = pd.DataFrame([mk(0, 0), mk(1, 25)])
    # batch 2 leads with an event BEFORE the open end (minute 15),
    # then closes the session via a >30-min gap
    b2 = pd.DataFrame([mk(2, 15), mk(3, 120)])
    now = time.time() - 3600
    tz = _session_tz(spark)
    for i, chunk in enumerate((b1, b2)):
        p = os.path.join(d, f"part-{i:03d}.parquet")
        _write_pdf(chunk, p, tz)
        os.utime(p, (now + i * 60, now + i * 60))

    run_stream_to_memory(
        sessionize_stream(spark, d, EVENT_SCHEMA), "ooo_sink")
    got = spark.table("ooo_sink").collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 3
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + pd.Timedelta(minutes=25)
