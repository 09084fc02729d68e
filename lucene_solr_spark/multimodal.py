"""Multimodal (binary) column operators for the 100 TB training-data
pipeline: images/audio/video ride in the corpus as opaque ``binary``
payload columns with typed metadata, and every operator is an
Arrow-batched transform over ``mapInPandas`` — the schema, partition
strategy, UDF signatures and batch shapes are the production plumbing.
Actual codec work (JPEG decode, audio resample, video demux) needs
libraries this container does not ship, so the codec kernel is
pluggable: a real decoder slots in behind ``register_decoder``; the
default is (a) a deterministic synthetic codec for the test fixtures
and (b) ``NotImplementedError`` for real payloads — clearly marked.

Scale design:
- payloads NEVER pass through Python row-at-a-time: one Arrow batch
  per ~`mapInPandas` invocation, bytes stay in numpy views.
- `repartition_by_bytes` rebalances by payload size (a 4 KB thumbnail
  and a 40 MB video must not land in the same task-size distribution),
  the binary-column analogue of AQE skew splitting.
- feature extraction emits fixed-width `array<float>` columns ready
  for the ANN operators (driver_entry.q_ann_*).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Dict, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int, "
    "codec string"
)

_MAGIC = b"SYNM"  # synthetic-media header magic


# -- synthetic codec (deterministic fake for tests) -------------------------

def synth_payload(doc_id: int, media_type: str, width: int = 8,
                  height: int = 6, n_frames: int = 4) -> bytes:
    """Deterministic fake media blob: header(magic, w, h, frames) +
    md5-keystream 'pixels'. Stable across processes (no RNG state)."""
    head = _MAGIC + struct.pack("<III", width, height, n_frames)
    body = b""
    need = width * height * max(n_frames, 1)
    i = 0
    while len(body) < need:
        body += hashlib.md5(
            f"{doc_id}:{media_type}:{i}".encode()
        ).digest()
        i += 1
    return head + body[:need]


def synth_media(spark, n: int = 64) -> DataFrame:
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        w, h, fr = 8 + (i % 5), 6 + (i % 3), 1 + (i % 6)
        rows.append((
            i, mt, bytearray(synth_payload(i, mt, w, h, fr)),
            w, h, 16000 if mt == "audio" else None,
            40 * fr if mt == "video" else None,
            "synm",
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_synth(payload: bytes):
    """-> (width, height, n_frames, pixels ndarray uint8) or None if
    not a synthetic blob."""
    if payload is None or bytes(payload[:4]) != _MAGIC:
        return None
    w, h, fr = struct.unpack("<III", bytes(payload[4:16]))
    px = np.frombuffer(bytes(payload[16:]), dtype=np.uint8)
    return w, h, fr, px


_DECODERS: Dict[str, Callable] = {}


def register_decoder(codec: str, fn: Callable) -> None:
    """Plug a real codec: fn(payload: bytes) -> (w, h, frames, pixels).
    E.g. a PIL/ffmpeg-backed decoder on a cluster that ships them."""
    _DECODERS[codec] = fn


# -- operators --------------------------------------------------------------

def decode_media(df: DataFrame) -> DataFrame:
    """payload -> decoded pixel/sample buffer + real dimensions.
    One Arrow batch per invocation; bytes handled as numpy views.
    The decoder registry is SNAPSHOT into the closure at plan time —
    executors import this module fresh, so driver-side registrations
    must ship with the task (cloudpickle)."""
    decoders = dict(_DECODERS)

    def decode_one(payload, codec):
        fn = decoders.get(codec)
        if fn is not None:
            return fn(payload)
        out = _decode_synth(payload)
        if out is None:
            raise NotImplementedError(
                f"no decoder registered for codec {codec!r} and payload "
                "is not the synthetic test format; register_decoder() a "
                "real one (image/audio libs are not in this container)"
            )
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            w_, h_, fr_, buf = [], [], [], []
            for payload, codec in zip(pdf["payload"], pdf["codec"]):
                w, h, fr, px = decode_one(payload, codec)
                w_.append(w)
                h_.append(h)
                fr_.append(fr)
                buf.append(px.tobytes())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": pd.Series(w_, dtype="int32"),
                "height": pd.Series(h_, dtype="int32"),
                "n_frames": pd.Series(fr_, dtype="int32"),
                "pixels": buf,
            })

    return df.mapInPandas(
        run,
        "doc_id long, media_type string, width int, height int, "
        "n_frames int, pixels binary",
    )


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize of decoded frames (the real kernel
    would be PIL/opencv; nearest-neighbour over the synthetic buffer is
    the same Arrow batch shape and index math)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for r in pdf.itertuples(index=False):
                px = np.frombuffer(r.pixels, dtype=np.uint8)
                frame = px[: r.width * r.height].reshape(r.height, r.width)
                yi = (np.arange(out_h) * r.height // out_h)
                xi = (np.arange(out_w) * r.width // out_w)
                out.append(frame[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": pd.Series([out_w] * len(pdf), dtype="int32"),
                "height": pd.Series([out_h] * len(pdf), dtype="int32"),
                "pixels": out,
            })

    return decoded.mapInPandas(
        run, "doc_id long, width int, height int, pixels binary"
    )


def frame_sample(decoded: DataFrame, every: int = 2) -> DataFrame:
    """Sample every ``every``-th frame of video payloads into one row
    per frame — the explode-shaped operator (a 2 h video becomes ~3600
    rows that downstream operators process independently)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for r in pdf.itertuples(index=False):
                sz = r.width * r.height
                px = np.frombuffer(r.pixels, dtype=np.uint8)
                for fi in range(0, int(r.n_frames), every):
                    ids.append(r.doc_id)
                    idxs.append(fi)
                    frames.append(px[fi * sz:(fi + 1) * sz].tobytes())
            if ids:
                yield pd.DataFrame({
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                })

    return decoded.filter(F.col("media_type") == "video").mapInPandas(
        run, "doc_id long, frame_idx int, frame binary"
    )


def extract_features(df: DataFrame, payload_col: str = "payload",
                     dim: int = 8) -> DataFrame:
    """Deterministic feature embedding from a binary column: dim f32
    values derived from md5(payload || ':' || i), scaled to [0, 1).
    The production swap-in is a model forward pass over the same Arrow
    batches; shape (fixed-width array<float>) and determinism are what
    downstream ANN operators (q_ann_*) rely on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf[payload_col]:
                b = bytes(payload) if payload is not None else b""
                vec = np.empty(dim, dtype=np.float32)
                for i in range(dim):
                    h = hashlib.md5(b + b":" + str(i).encode()).digest()
                    vec[i] = int.from_bytes(h[:8], "big") / float(1 << 64)
                feats.append(vec.tolist())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "feature": feats,
            })

    return df.mapInPandas(run, "doc_id long, feature array<float>")


def repartition_by_bytes(
    df: DataFrame,
    payload_col: str = "payload",
    target_bytes: int = 128 * 1024 * 1024,
    min_parts: Optional[int] = None,
) -> DataFrame:
    """Partition-size control for skewed binary columns: choose the
    partition count from total payload bytes / target task bytes (the
    binary-column analogue of spark.sql.files.maxPartitionBytes, which
    cannot see through an already-loaded DataFrame), then hash-spread
    rows. Keeps a 40 MB-video-heavy slice from blowing task memory
    while thumbnails starve other tasks."""
    total = df.agg(
        F.sum(F.length(F.col(payload_col))).alias("b")
    ).collect()[0]["b"] or 0
    parts = max(int(total // target_bytes) + 1, min_parts or 1)
    return df.repartition(parts, F.col("doc_id"))
