"""UnixTime — the reference's chrono-free timestamp wrapper (S8).

Mirrors ``UnixTime(i64)`` with ``as_seconds``/``from_seconds``
(/root/reference/src/opencage.rs:646-663; chrono was dropped in favor of
a plain i64 per CHANGES.md:9-28).  Column form is Arrow
``timestamp('s')`` / ``int64``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class UnixTime:
    seconds: int

    def as_seconds(self) -> int:
        return self.seconds

    @classmethod
    def from_seconds(cls, seconds: int) -> "UnixTime":
        return cls(int(seconds))


def unix_seconds_to_timestamp(col) -> pa.Array:
    """int64 seconds -> Arrow timestamp('s') (UTC-naive, like DuckDB)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(np.asarray(col, dtype=np.int64), type=pa.int64())
    return col.cast(pa.timestamp("s"))


def timestamp_to_unix_seconds(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.timestamp("s")).cast(pa.int64())
