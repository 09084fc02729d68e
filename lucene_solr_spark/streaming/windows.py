"""Event-time windowed aggregation and custom stateful sessionization.

The reference has no event-time semantics (SURVEY.md §2.10: Lucene's
streaming story is NRT segment visibility, and late data simply lands
in the next micro-batch). These operators EXTEND the engine with the
Structured-Streaming-native equivalents a large-scale event pipeline
needs on top of the same tables:

  * ``windowed_counts_batch`` / ``windowed_counts_stream`` — tumbling
    event-time windows over ``events.ts`` with a watermark; the batch
    plan and the streaming plan share one aggregation spec, so the
    pytest gate can assert batch == stream row-for-row on finalized
    windows and that a row older than the watermark is DROPPED from an
    already-finalized window (the late-data contract).
  * ``sessionize_batch`` / ``sessionize_stream`` — per-user session
    windows with an inactivity gap. The batch path is gaps-and-islands
    (lag + cumulative sum — two window functions over one shuffle by
    user); the streaming path is a custom stateful operator via
    ``applyInPandasWithState`` holding ONE open session per user and
    emitting sessions as soon as a later in-stream event proves them
    closed (gap exceeded). Stream output is therefore exactly the
    batch output minus each user's final (still-open) session — the
    equivalence the test asserts.

Scale notes (100 TB): both paths shuffle once on their natural key
(window bucket / user_id). Per-user state is O(1) (one open session),
so executor state stores stay bounded regardless of stream length;
the windowed agg's state is bounded by watermark horizon × bucket
cardinality. Sums are folded in integer cents (exact, order-free) so
results are bitwise reproducible across partitionings.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType, StructField, StructType, TimestampType,
)

WINDOW_MINUTES = 15
SESSION_GAP_MINUTES = 30
WATERMARK = "20 minutes"

_US_PER_MIN = 60_000_000


def _cents(col):
    # exact integer fold: `value` carries 2 decimals by construction,
    # so sum order / partitioning cannot perturb the result the way a
    # double fold would
    return F.round(F.col(col) * 100).cast("long")


def windowed_counts_batch(events: DataFrame,
                          width_minutes: int = WINDOW_MINUTES) -> DataFrame:
    """Tumbling-window counts + exact value sum per (window, type).

    One partial-agg shuffle on (window, event_type); the window bucket
    is a pure projection so the plan is scan -> hash agg."""
    return (
        events
        .groupBy(
            F.window("ts", f"{width_minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "value_cents",
        )
    )


def windowed_counts_stream(spark, src_dir: str, schema: StructType,
                           width_minutes: int = WINDOW_MINUTES,
                           watermark: str = WATERMARK,
                           max_files_per_trigger: int = 1):
    """Streaming twin of ``windowed_counts_batch``.

    Append output mode: a window row is emitted once the event-time
    watermark passes its end — i.e. only FINALIZED windows, and rows
    arriving later than the watermark are dropped from windows already
    finalized (the Structured Streaming late-data contract)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    # watermarks are defined on TIMESTAMP (ltz) only — event time is
    # normalized to ltz here (no-op when the source already is), so a
    # ntz source emits ltz window starts (same wall clock, one zone)
    return (
        src.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{width_minutes} minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "value_cents",
        )
    )


def sessionize_batch(events: DataFrame,
                     gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Per-user session windows, batch plan (gaps-and-islands).

    lag(ts) flags session starts, a running sum numbers sessions, one
    grouped agg collapses them — all over a single shuffle by user_id
    (two analytic passes + the agg reuse the same hash partitioning)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * _US_PER_MIN
    # timestampdiff works on TIMESTAMP_NTZ directly (no session-tz
    # round-trip, so a DST-straddling pair can't perturb the delta)
    flagged = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(F.col("prev_ts").isNull(), F.lit(1))
            .when(
                F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                > F.lit(gap_us),
                F.lit(1),
            )
            .otherwise(F.lit(0)),
        )
        .withColumn("sess_no", F.sum("new_sess").over(w))
    )
    return (
        flagged.groupBy("user_id", "sess_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.sum(_cents("value")).alias("value_cents"),
        )
        .select("user_id", "session_start", "session_end",
                "n_events", "value_cents")
    )


SESSION_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("value_cents", LongType()),
])

# open session carried across micro-batches: timestamps as int64
# microseconds (Arrow state rows must be exact; no tz ambiguity)
SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("end_us", LongType()),
    StructField("n_events", LongType()),
    StructField("value_cents", LongType()),
])


def _session_fn_factory(gap_minutes: int):
    gap_us = gap_minutes * _US_PER_MIN

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        ts = batch["ts"]
        if getattr(ts.dtype, "tz", None) is not None:
            ts = ts.dt.tz_localize(None)
        # explicit micros: a bare astype(int64) on datetime64[ns]
        # would hand back nanoseconds
        ts_us = ts.astype("datetime64[us]").astype("int64").to_numpy()
        cents = (batch["value"] * 100).round().astype("int64").to_numpy()

        if state.exists:
            start_us, end_us, n, val = state.get
        else:
            start_us = end_us = -1
            n = val = 0

        closed = []
        for t, c in zip(ts_us, cents):
            if start_us < 0:
                start_us, end_us, n, val = t, t, 1, int(c)
            elif t - end_us > gap_us:
                closed.append((start_us, end_us, n, val))
                start_us, end_us, n, val = t, t, 1, int(c)
            else:
                # max(): a cross-batch out-of-order event inside the
                # gap extends membership but must not move the open
                # session's end backwards (batches are sorted, the
                # stream between batches need not be)
                if t > end_us:
                    end_us = t
                if t < start_us:
                    start_us = t
                n, val = n + 1, val + int(c)
        state.update((int(start_us), int(end_us), int(n), int(val)))

        if closed:
            out = pd.DataFrame(
                closed,
                columns=["start_us", "end_us", "n_events", "value_cents"],
            )
            yield pd.DataFrame({
                "user_id": pd.Series([user_id] * len(out), dtype="int64"),
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
                "n_events": out["n_events"].astype("int64"),
                "value_cents": out["value_cents"].astype("int64"),
            })

    return fn


def sessionize_stream(spark, src_dir: str, schema: StructType,
                      gap_minutes: int = SESSION_GAP_MINUTES,
                      max_files_per_trigger: int = 1):
    """Streaming twin of ``sessionize_batch`` as a CUSTOM STATEFUL
    OPERATOR (applyInPandasWithState).

    State per user = the one open session. A session is emitted as
    soon as a later event of the same user arrives past the gap —
    closure proven in-stream, no timeout clock needed — so the stream
    output equals the batch output minus each user's final session
    (which never closes inside the finite test stream)."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    return (
        src.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn_factory(gap_minutes),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def run_stream_to_memory(stream_df, name: str) -> None:
    """Drain a finite file stream into a memory sink (availableNow:
    process everything present, micro-batch by micro-batch, stop)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
