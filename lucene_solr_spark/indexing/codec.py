"""Posting-list codec: docID d-gaps + FOR(128) bit-packed blocks, skip
array with per-block max-score metadata, singleton optimization.

Reference format being re-expressed (not byte-copied):
  - d-gap + 128-int FOR blocks: lucene/core/src/java/org/apache/lucene/
    codecs/lucene41/Lucene41PostingsFormat.java:50-57,212-237 (BLOCK_SIZE
    =384), ForUtil.java:157-204
  - all-equal block optimization: ForUtil.java:38-41,158-162 (we use a
    0xFF-marker header + one 8-byte value; reference uses 1-byte marker
    + vint — same idea, different bytes, FORMAT_VERSION pins ours)
  - tail block: reference writes VInts (Lucene41PostingsFormat.java:
    221-237); we FOR-pack the partial tail block instead — a documented
    lossless design choice (SURVEY.md section 2.5), faster to vectorize
  - skip data every 128 docs: codecs/MultiLevelSkipListWriter.java:56-81,
    Lucene41SkipWriter.java:46-150. We keep ONE level (a posting row is
    already partition-local; binary search over the skip array replaces
    multi-level seek) and ride the block-max metadata on the same array
    (max_tf + max_norm_byte per block -> safe BM25 block upper bound;
    this metadata does NOT exist in the reference snapshot — our WAND
    addition per the north rule, SURVEY.md section 2.7)
  - singleton terms (df==1) store doc inline, no blocks:
    Lucene41PostingsFormat.java:165-167, Lucene41PostingsWriter.java:
    496-520

Block layout per block: 1 header byte W; if W==0xFF -> 8-byte LE uint64
(all-equal value); else 16*W bytes = 128 values bit-packed LSB-first.
The tail block packs `count` values (count from the skip entry) in
ceil(count*W/8) bytes.

Skip entry dtype (packed little-endian, 33 bytes):
  last_doc  int64   — last docID in block (inclusive)
  base      int64   — docID preceding the block's first (-1 for the
                      absolute-first block): docs = cumsum(deltas)+base.
                      Every block is fully self-contained, so posting
                      rows CONCATENATE byte-wise (offset rebase only) —
                      the segment merge never decodes surviving blocks.
  doc_off   int32   — byte offset of block in doc_ids_enc
  tf_off    int32   — byte offset of block in tfs_enc
  count     int32   — postings in block (128 except tail)
  max_tf    int32   — block-max term frequency
  max_nb    uint8   — block-max norm byte (= min quantized doc length)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from lucene_solr_spark.constants import BLOCK_SIZE

SKIP_DTYPE = np.dtype(
    [
        ("last_doc", "<i8"),
        ("base", "<i8"),
        ("doc_off", "<i4"),
        ("tf_off", "<i4"),
        ("count", "<i4"),
        ("max_tf", "<i4"),
        ("max_nb", "u1"),
    ]
)

ALL_EQUAL = 0xFF
VINT_BLOCK = 0xFE   # block-header marker for the 'vint_tail' family
TEXT_BLOCK = 0xFD   # block-header marker for the 'simpletext' family
CODEC_FAMILIES = ("for128", "vint_tail", "simpletext")


def _pack_block(values: np.ndarray) -> bytes:
    """Bit-pack one block (<=128 uint64 values) LSB-first per value.

    Fast paths produce byte-identical output to the generic numpy
    path: most blocks in a code corpus are tiny (median per-segment df
    is single digits), where Python-int bit concatenation beats the
    broadcast bit-matrix by ~10x."""
    n = len(values)
    if n == 1:
        v = int(values[0])
        width = max(v.bit_length(), 1)
        return bytes([width]) + v.to_bytes((width + 7) // 8, "little")
    # one array->list conversion up front; list.count / max() are
    # C-speed and beat numpy reductions at block sizes <=128
    vals = values.tolist()
    if vals.count(vals[0]) == n:
        return bytes([ALL_EQUAL]) + int(vals[0]).to_bytes(8, "little")
    width = max(max(vals).bit_length(), 1)
    if n * width <= 1024:
        # LSB-first concatenation via one big Python int — identical
        # bit layout to packbits(..., bitorder="little")
        big = 0
        shift = 0
        for v in vals:
            big |= v << shift
            shift += width
        return bytes([width]) + big.to_bytes((shift + 7) // 8, "little")
    # (n, width) bit matrix, bit j of value i at [i, j] (LSB first)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((values[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits.reshape(-1), bitorder="little")
    return bytes([width]) + packed.tobytes()


def _pack_block_vint(values: np.ndarray) -> bytes:
    """VInt block (codec family 'vint_tail'): 0xFE marker + Lucene-style
    base-128 varints, low 7 bits first, high bit = continuation
    (store/DataOutput.java writeVInt). Used for partial tail blocks,
    where the reference's Lucene41 format also writes VInts
    (Lucene41PostingsFormat.java:221-237) — this closes the documented
    FOR-packed-tail divergence as an opt-in family. Blocks stay
    self-describing (the header byte selects the decoder), so FOR and
    VInt blocks coexist in one stream and merges stay concat-only."""
    out = bytearray([VINT_BLOCK])
    for v in values.tolist():
        v = int(v)
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
    return bytes(out)


def _pack_block_text(values: np.ndarray) -> bytes:
    """SimpleText block (codec family 'simpletext'): 0xFD marker +
    ASCII space-separated decimals + newline — the debugging codec
    (lucene/codecs/.../simpletext/SimpleTextPostingsFormat.java: "FOR
    RECREATIONAL USE ONLY", values written as readable text). Keeps
    this engine's block invariants (self-describing header, concat-
    only merge) so simpletext blocks coexist with FOR/VInt blocks in
    one stream and IndexUpgrader can migrate between families."""
    body = " ".join(str(int(v)) for v in values.tolist())
    return bytes([TEXT_BLOCK]) + body.encode("ascii") + b"\n"


def _unpack_block_text(buf: memoryview, off: int,
                       count: int) -> Tuple[np.ndarray, int]:
    end = off + 1
    n = len(buf)
    while end < n and buf[end] != 0x0A:
        end += 1
    body = bytes(buf[off + 1:end]).decode("ascii")
    values = np.array([int(x) for x in body.split(" ")], dtype=np.uint64)
    assert len(values) == count
    return values, end - off + 1


def _unpack_block_vint(buf: memoryview, off: int,
                       count: int) -> Tuple[np.ndarray, int]:
    values = np.empty(count, dtype=np.uint64)
    i = off + 1
    for k in range(count):
        shift = 0
        v = 0
        while True:
            b = buf[i]
            i += 1
            v |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        values[k] = v
    return values, i - off


def _unpack_block(buf: memoryview, off: int, count: int) -> Tuple[np.ndarray, int]:
    """Inverse of _pack_block; returns (values uint64, bytes consumed).
    Self-describing per block: the header byte selects FOR width,
    ALL_EQUAL, or VINT_BLOCK decoding."""
    width = buf[off]
    if width == TEXT_BLOCK:
        return _unpack_block_text(buf, off, count)
    if width == VINT_BLOCK:
        return _unpack_block_vint(buf, off, count)
    if width == ALL_EQUAL:
        val = np.frombuffer(buf, "<u8", count=1, offset=off + 1)[0]
        return np.full(count, val, dtype=np.uint64), 9
    nbytes = (count * width + 7) // 8
    raw = np.frombuffer(buf, np.uint8, count=nbytes, offset=off + 1)
    bits = np.unpackbits(raw, bitorder="little", count=count * width)
    bits = bits.reshape(count, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    values = (bits << shifts).sum(axis=1, dtype=np.uint64)
    return values, 1 + nbytes


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, norm_bytes: np.ndarray,
    codec: str = "for128",
) -> Tuple[bytes, bytes, bytes]:
    """Encode one term's postings (sorted unique doc_ids, parallel tfs,
    parallel norm bytes for block-max metadata).

    ``codec`` selects the write-side family (CODEC_FAMILIES): 'for128'
    FOR-packs every block including the tail; 'vint_tail' writes the
    partial tail block as VInts, matching the reference's Lucene41 tail
    (Lucene41PostingsFormat.java:221-237). Decoding needs no codec
    selector — blocks are self-describing via the header byte.

    Returns (doc_ids_enc, tfs_enc, skips_enc). Caller handles the
    singleton df==1 case separately (no encoding at all).
    """
    if codec not in CODEC_FAMILIES:
        raise ValueError(f"unknown codec {codec!r}; one of {CODEC_FAMILIES}")
    n = len(doc_ids)
    assert n >= 1
    deltas = np.diff(doc_ids, prepend=np.int64(-1)).astype(np.uint64)
    tfs64 = tfs.astype(np.uint64)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE

    doc_parts: List[bytes] = []
    tf_parts: List[bytes] = []
    skips = np.empty(n_blocks, dtype=SKIP_DTYPE)
    doc_off = tf_off = 0
    for bi in range(n_blocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        if codec == "simpletext":
            pack = _pack_block_text
        elif codec == "vint_tail" and hi - lo < BLOCK_SIZE:
            pack = _pack_block_vint
        else:
            pack = _pack_block
        db = pack(deltas[lo:hi])
        tb = pack(tfs64[lo:hi])
        skips[bi] = (
            doc_ids[hi - 1],
            -1 if lo == 0 else doc_ids[lo - 1],
            doc_off,
            tf_off,
            hi - lo,
            int(tfs[lo:hi].max()),
            int(norm_bytes[lo:hi].max()),
        )
        doc_parts.append(db)
        tf_parts.append(tb)
        doc_off += len(db)
        tf_off += len(tb)
    return b"".join(doc_parts), b"".join(tf_parts), skips.tobytes()


def decode_skips(skips_enc: bytes) -> np.ndarray:
    return np.frombuffer(skips_enc, dtype=SKIP_DTYPE)


def decode_postings(
    doc_ids_enc: bytes,
    tfs_enc: bytes,
    skips_enc: bytes,
    block_mask: np.ndarray | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode postings, optionally only blocks selected by block_mask
    (bool array over blocks — the skip/WAND path decodes a subset).

    Returns (doc_ids int64, tfs int32).
    """
    skips = decode_skips(skips_enc)
    dbuf, tbuf = memoryview(doc_ids_enc), memoryview(tfs_enc)
    docs_out: List[np.ndarray] = []
    tfs_out: List[np.ndarray] = []
    for bi in range(len(skips)):
        if block_mask is not None and not block_mask[bi]:
            continue
        s = skips[bi]
        count = int(s["count"])
        deltas, _ = _unpack_block(dbuf, int(s["doc_off"]), count)
        tfs, _ = _unpack_block(tbuf, int(s["tf_off"]), count)
        # self-contained block: cumsum anchored by the stored base
        # (deltas were diff'd with prepend=base, so cumsum+base restores)
        docs = deltas.astype(np.int64).cumsum() + np.int64(s["base"])
        docs_out.append(docs)
        tfs_out.append(tfs.astype(np.int32))
    if not docs_out:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    return np.concatenate(docs_out), np.concatenate(tfs_out)


def concat_postings(
    parts: List[Tuple[bytes, bytes, bytes]],
) -> Tuple[bytes, bytes, bytes]:
    """Concatenate self-contained posting parts (ascending disjoint doc
    ranges) WITHOUT decoding: join the byte streams, rebase the skip
    entries' byte offsets. The zero-CPU segment-merge primitive."""
    if len(parts) == 1:
        return parts[0]
    doc_parts, tf_parts, skip_arrs = [], [], []
    doc_off = tf_off = 0
    for d, t, s in parts:
        sk = np.frombuffer(s, dtype=SKIP_DTYPE).copy()
        sk["doc_off"] += doc_off
        sk["tf_off"] += tf_off
        skip_arrs.append(sk)
        doc_parts.append(d)
        tf_parts.append(t)
        doc_off += len(d)
        tf_off += len(t)
    return (
        b"".join(doc_parts),
        b"".join(tf_parts),
        np.concatenate(skip_arrs).tobytes(),
    )


# -- positions (.pos / .prox analogue) --------------------------------------
# Reference: positions are per-doc deltas appended to the term's prox
# stream (Lucene41PostingsFormat.java:240-254 'PosDelta'; writer
# Lucene41PostingsWriter.java:300-349). Ours: one flat delta array per
# posting row (first position of each doc absolute, then in-doc deltas),
# FOR-packed in the same 128-value blocks. Per-element doc boundaries
# are implied by the row's tf values, so no extra length prefix is
# stored.

def encode_prox(deltas: np.ndarray) -> bytes:
    """FOR-pack a flat position-delta array in BLOCK_SIZE chunks."""
    parts: List[bytes] = []
    d = deltas.astype(np.uint64)
    for lo in range(0, len(d), BLOCK_SIZE):
        parts.append(_pack_block(d[lo : lo + BLOCK_SIZE]))
    return b"".join(parts)


def decode_prox(buf: bytes, count: int) -> np.ndarray:
    """Inverse of encode_prox; returns uint64 deltas of length count."""
    mv = memoryview(buf)
    out: List[np.ndarray] = []
    off = 0
    remaining = int(count)
    while remaining > 0:
        c = min(BLOCK_SIZE, remaining)
        vals, used = _unpack_block(mv, off, c)
        out.append(vals)
        off += used
        remaining -= c
    if not out:
        return np.empty(0, np.uint64)
    return np.concatenate(out)


def decode_prox_parts(
    buf: bytes, counts: Optional[np.ndarray], total: int
) -> np.ndarray:
    """Decode a prox stream that may be a concatenation of independently
    block-chunked parts (merged rows carry the per-part delta counts in
    ``pos_cnts``; fresh rows have counts=None = one part of ``total``).
    Part boundaries are doc boundaries, so the concatenated delta array
    feeds positions_from_deltas unchanged."""
    if counts is None:
        return decode_prox(buf, total)
    mv = memoryview(buf)
    out: List[np.ndarray] = []
    off = 0
    for cnt in counts:
        remaining = int(cnt)
        while remaining > 0:
            c = min(BLOCK_SIZE, remaining)
            vals, used = _unpack_block(mv, off, c)
            out.append(vals)
            off += used
            remaining -= c
    if not out:
        return np.empty(0, np.uint64)
    return np.concatenate(out)


def positions_from_deltas(deltas: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Segmented cumsum: per-doc absolute positions from the flat delta
    array (doc boundaries given by tfs)."""
    if len(deltas) == 0:
        return np.empty(0, np.int64)
    cum = np.cumsum(deltas.astype(np.int64))
    ends = np.cumsum(tfs.astype(np.int64))
    starts = ends - tfs
    base = np.repeat(
        np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0), tfs
    )
    return cum - base


def deltas_from_positions(pos: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Inverse of positions_from_deltas."""
    if len(pos) == 0:
        return np.empty(0, np.uint64)
    delta = pos.astype(np.int64).copy()
    delta[1:] -= pos[:-1]
    starts = np.cumsum(tfs.astype(np.int64)) - tfs
    delta[starts] = pos[starts]
    return delta.astype(np.uint64)
