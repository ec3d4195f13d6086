"""Audio feature extraction over opaque ``binary`` payload columns.

Round-4: the WAV/PCM path is REAL (``sources/wav.py`` — RIFF + raw
PCM needs no codec library); formats that genuinely need external
codecs (mp3/ogg/flac) still raise or fall back to the deterministic
stub in ``stages/image_ops.AudioFeatureStub`` per the build brief.

The stage follows the multimodal contract (SURVEY.md §4.2): actor-pool
``map_batches``, payload column dropped on output so shuffles never
move samples, and integer feature columns (sum of squares, peak, zero
crossings) chosen so the whole path is oracle-gateable bit-exactly —
floats derived from transcendental DSP would not be.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.wav import decode_wav


class AudioFeatures:
    """Actor stage: WAV bytes -> per-payload integer features + rms.

    Output columns: ``audio_ok`` (decode success), ``sample_rate``,
    ``n_samples``, ``n_channels``, ``peak_abs``, ``sum_sq``,
    ``zero_crossings`` (all first-channel, integer-exact) and a
    convenience ``rms`` float (NOT intended for hash compares).
    Undecodable payloads yield ``audio_ok == False`` with zeroed
    features — no task error, mirroring the TIFF probe's error row
    contract.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("bytes")
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        rate = np.zeros(n, dtype=np.int32)
        nsamp = np.zeros(n, dtype=np.int64)
        nchan = np.zeros(n, dtype=np.int32)
        peak = np.zeros(n, dtype=np.int32)
        sumsq = np.zeros(n, dtype=np.int64)
        zc = np.zeros(n, dtype=np.int64)
        rms = np.zeros(n, dtype=np.float64)
        bufs = col.to_pylist()
        for i, buf in enumerate(bufs):
            if not buf:
                continue
            try:
                r, s = decode_wav(buf)
            except ValueError:
                continue
            ok[i] = True
            rate[i] = r
            nsamp[i] = s.shape[0]
            nchan[i] = s.shape[1]
            if s.shape[0]:
                c0 = s[:, 0].astype(np.int64)
                peak[i] = int(np.abs(c0).max())
                sumsq[i] = int((c0 * c0).sum())
                neg = c0 < 0
                zc[i] = int((neg[1:] != neg[:-1]).sum())
                rms[i] = float(np.sqrt(sumsq[i] / s.shape[0]))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column("audio_ok", pa.array(ok))
        out = out.append_column("sample_rate", pa.array(rate, type=pa.int32()))
        out = out.append_column("n_samples", pa.array(nsamp, type=pa.int64()))
        out = out.append_column("n_channels", pa.array(nchan, type=pa.int32()))
        out = out.append_column("peak_abs", pa.array(peak, type=pa.int32()))
        out = out.append_column("sum_sq", pa.array(sumsq, type=pa.int64()))
        out = out.append_column("zero_crossings", pa.array(zc, type=pa.int64()))
        out = out.append_column("rms", pa.array(rms, type=pa.float64()))
        return out
