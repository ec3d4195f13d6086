"""Engine raw-video container: header + concatenated RGB frames.

Round-4: real frame SAMPLING needs no inter-frame codec — the
operation is a strided slice out of the payload — so the engine
defines a minimal uncompressed container (magic ``GRV1``, u32 LE
w/h/n_frames/fps_num, then ``n_frames`` raw ``h*w*3`` RGB planes) and
implements extraction for real.  Compressed containers (mp4/webm)
still raise per the build brief; the Ray-side contract (binary
payload column, typed metadata, payload dropped after the stage) is
identical for both.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GRV1"
_HDR = struct.Struct("<4sIIII")


def encode_rawvideo(frames: np.ndarray, fps: int = 30) -> bytes:
    """(n, h, w, 3) uint8 -> container bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_rawvideo expects (n, h, w, 3) uint8")
    n, h, w = frames.shape[:3]
    return _HDR.pack(_MAGIC, w, h, n, fps) + frames.tobytes()


def video_info(buf: bytes) -> tuple[int, int, int, int]:
    """-> (w, h, n_frames, fps).  Raises ``ValueError`` on non-GRV1 or a
    size-inconsistent payload."""
    if len(buf) < _HDR.size:
        raise ValueError("short raw-video payload")
    magic, w, h, n, fps = _HDR.unpack_from(buf)
    if magic != _MAGIC:
        raise ValueError("not a GRV1 raw-video payload")
    if len(buf) != _HDR.size + n * h * w * 3:
        raise ValueError("raw-video size mismatch")
    return w, h, n, fps


def extract_frames(buf: bytes, indices: np.ndarray) -> np.ndarray:
    """-> (len(indices), h, w, 3) uint8, zero-copy view of the payload
    reshaped then gathered (one slice per requested frame, no full
    materialization of unsampled frames)."""
    w, h, n, _fps = video_info(buf)
    idx = np.asarray(indices, dtype=np.int64)
    if len(idx) and (idx.min() < 0 or idx.max() >= n):
        raise ValueError("frame index out of range")
    view = np.frombuffer(buf, dtype=np.uint8, offset=_HDR.size).reshape(n, h, w, 3)
    return view[idx]
