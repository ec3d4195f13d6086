"""Engine inter-frame (temporal-delta) video codec: GRV2.

Round-5 (round-4 VERDICT Next #5): the real COMPRESSED companion to the
raw GRV1 container (sources/rawvideo.py).  Layout::

    header  <4sIIIII>  magic 'GRV2', w, h, n_frames, fps, keyint
    table   n_frames x <IB>  (record byte size, frame type 0=I / 1=P)
    records concatenated

* I-frames (every ``keyint``-th frame, or whenever delta coding would
  not shrink the frame) store the raw ``h*w*3`` RGB plane.
* P-frames store the mod-256 temporal residual vs the PREVIOUS
  reconstructed frame, run-length encoded as (count u8 1..255, value
  u8) pairs — the classic byte-RLE every delta codec bottoms out at.

The codec is LOSSLESS (residuals are exact mod-256 differences), so
decoded pixels equal the originals bit-for-bit; decode of frame ``j``
seeks to the nearest preceding I-frame and accumulates residuals
forward — the real random-access semantics of a GOP-structured stream.
Encode and decode are vectorized numpy end to end (run boundaries via
one ``np.diff``/``np.nonzero`` pass; residual accumulation via uint8
wraparound adds).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GRV2"
_HDR = struct.Struct("<4sIIIII")
_ENT = struct.Struct("<IB")
DEFAULT_KEYINT = 8


def _rle_encode(data: np.ndarray) -> bytes:
    """uint8 1-D -> (count, value) byte pairs; runs longer than 255
    split into max-count chunks.  Fully vectorized."""
    if len(data) == 0:
        return b""
    change = np.nonzero(np.diff(data))[0] + 1
    starts = np.r_[np.zeros(1, dtype=np.int64), change]
    lengths = np.r_[change, np.array([len(data)])] - starts
    vals = data[starts]
    n_chunks = -(-lengths // 255)
    total = int(n_chunks.sum())
    counts = np.full(total, 255, dtype=np.uint8)
    rem = (lengths - (n_chunks - 1) * 255).astype(np.uint8)
    counts[np.cumsum(n_chunks) - 1] = rem
    out = np.empty((total, 2), dtype=np.uint8)
    out[:, 0] = counts
    out[:, 1] = np.repeat(vals, n_chunks)
    return out.tobytes()


def _rle_decode(buf: bytes, out_len: int) -> np.ndarray:
    """(count, value) pairs -> uint8 1-D of exactly ``out_len``."""
    if len(buf) % 2:
        raise ValueError("odd RLE payload")
    pairs = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 2)
    counts = pairs[:, 0].astype(np.int64)
    if counts.sum() != out_len or (len(counts) and counts.min() == 0):
        raise ValueError("RLE length mismatch")
    return np.repeat(pairs[:, 1], counts)


def encode_deltavideo(frames: np.ndarray, fps: int = 30, keyint: int = DEFAULT_KEYINT) -> bytes:
    """(n, h, w, 3) uint8 -> GRV2 container bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_deltavideo expects (n, h, w, 3) uint8")
    if keyint < 1:
        raise ValueError("keyint must be >= 1")
    n, h, w = frames.shape[:3]
    fb = h * w * 3
    table, records = [], []
    prev: np.ndarray | None = None
    for k in range(n):
        cur = frames[k].reshape(-1)
        if k % keyint == 0 or prev is None:
            rec, t = cur.tobytes(), 0
        else:
            rec, t = _rle_encode(cur - prev), 1  # uint8 wraparound = mod-256
            if len(rec) >= fb:  # delta didn't shrink it: real codecs fall back
                rec, t = cur.tobytes(), 0
        table.append(_ENT.pack(len(rec), t))
        records.append(rec)
        prev = cur
    return (
        _HDR.pack(_MAGIC, w, h, n, fps, keyint) + b"".join(table) + b"".join(records)
    )


def video_info(buf: bytes) -> tuple[int, int, int, int, int]:
    """-> (w, h, n_frames, fps, keyint); raises on non-GRV2/bad sizes."""
    if len(buf) < _HDR.size:
        raise ValueError("short delta-video payload")
    magic, w, h, n, fps, keyint = _HDR.unpack_from(buf)
    if magic != _MAGIC:
        raise ValueError("not a GRV2 delta-video payload")
    if len(buf) < _HDR.size + n * _ENT.size:
        raise ValueError("truncated GRV2 frame table")
    return w, h, n, fps, keyint


def _parse_table(buf: bytes, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (sizes, types, offsets) of the n frame records."""
    raw = np.frombuffer(buf, dtype=np.uint8, count=n * _ENT.size, offset=_HDR.size)
    ent = raw.reshape(n, _ENT.size)
    sizes = (
        ent[:, 0].astype(np.int64)
        | (ent[:, 1].astype(np.int64) << 8)
        | (ent[:, 2].astype(np.int64) << 16)
        | (ent[:, 3].astype(np.int64) << 24)
    )
    types = ent[:, 4].astype(np.int64)
    offsets = _HDR.size + n * _ENT.size + np.r_[np.zeros(1, dtype=np.int64), np.cumsum(sizes)[:-1]]
    expected = _HDR.size + n * _ENT.size + int(sizes.sum())
    if len(buf) != expected:
        raise ValueError("GRV2 size mismatch")
    return sizes, types, offsets


def extract_frames(buf: bytes, indices: np.ndarray) -> np.ndarray:
    """-> (len(indices), h, w, 3) uint8; each requested frame decoded by
    seeking to its nearest preceding I-frame and accumulating P-frame
    residuals forward — shared prefixes inside one call are decoded
    once (indices are processed in sorted order with a running state)."""
    w, h, n, _fps, _keyint = video_info(buf)
    fb = h * w * 3
    idx = np.asarray(indices, dtype=np.int64)
    if len(idx) and (idx.min() < 0 or idx.max() >= n):
        raise ValueError("frame index out of range")
    sizes, types, offsets = _parse_table(buf, n)
    if (types == 1)[0:1].any():
        raise ValueError("GRV2 stream must start with an I-frame")
    order = np.argsort(idx, kind="stable")
    out = np.empty((len(idx), fb), dtype=np.uint8)
    state: np.ndarray | None = None
    state_at = -1
    iframe_pos = np.nonzero(types == 0)[0]
    for oi in order:
        j = int(idx[oi])
        # restart at the GOP head unless the running state already sits
        # at or before j within the same GOP
        key = int(iframe_pos[np.searchsorted(iframe_pos, j, side="right") - 1])
        start = state_at + 1 if (state is not None and key <= state_at <= j) else key
        if start == key:
            state = np.frombuffer(
                buf, dtype=np.uint8, count=fb, offset=int(offsets[key])
            ).copy()
            state_at = key
            start = key + 1
        for k in range(start, j + 1):
            rec = buf[int(offsets[k]) : int(offsets[k]) + int(sizes[k])]
            if types[k] == 0:
                state = np.frombuffer(rec, dtype=np.uint8).copy()
            else:
                state += _rle_decode(rec, fb)  # uint8 wraparound add
            state_at = k
        out[oi] = state
    return out.reshape(len(idx), h, w, 3)
