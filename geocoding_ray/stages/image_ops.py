"""Multimodal (image/audio/video) batch stages.

Payloads are opaque ``binary`` columns with typed metadata (w, h, fmt)
per the input contract.  The Ray-side plumbing — schemas, actor pools,
batch sizing for wide binary rows — is real and tested.  Codecs:
uncompressed TIFF (sources/tiff.py), PNG (sources/png.py — stdlib
zlib), baseline JPEG (sources/jpeg.py — from-scratch DCT + Huffman,
PSNR-verified), WAV/PCM audio (sources/wav.py + stages/audio.py) and
raw-video frame sampling (sources/rawvideo.py) are all REAL as of
round 4; only formats whose codecs genuinely need absent libraries
(webp/heic, mp3/ogg, compressed video containers) remain STUBBED
behind ``NotImplementedError`` or a deterministic fake, as the build
brief permits.

Memory note (SURVEY.md §4.2): stages that touch pixels use a small
``batch_size`` (bytes dominate block size); downstream columns drop the
payload so shuffles never move pixels.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..sources.tiff import parse_pixels


def sniff_format(buf: bytes | None) -> str:
    """Magic-byte format sniff — the ONE copy of the signature constants
    shared by decode/resize/transcode dispatch (round-4 review)."""
    if not buf:
        return "unknown"
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if buf[:2] == b"\xff\xd8":
        return "jpeg"
    if buf[:2] in (b"II", b"MM"):
        return "tiff"
    return "unknown"


class ImageDecode:
    """Actor stage: bytes -> decoded pixel stats (mean RGB, phash check).

    Decodes the engine's TIFF/PNG/JPEG; any other ``fmt`` raises
    ``NotImplementedError`` unless ``fake_missing`` is set, in which case
    a deterministic fake (hash-derived stats) stands in for the decoder.
    Null/empty payloads are a decode MISS (``decode_ok == False``), never
    a task error — a transcode stage upstream emits null rows for its
    own failures (round-4 review: the error-row contract must compose).
    """

    def __init__(self, fake_missing: bool = True):
        self.fake_missing = fake_missing

    def _decode(self, buf: bytes, fmt: str) -> np.ndarray | None:
        if not buf:
            return None
        if not fmt or fmt == "unknown":
            fmt = sniff_format(buf)
        if fmt == "tiff":
            try:
                return parse_pixels(buf)
            except Exception:
                return None
        if fmt == "png":
            from ..sources.png import decode_png

            try:
                return decode_png(buf)
            except Exception:
                return None
        if fmt in ("jpeg", "jpg"):
            from ..sources.jpeg import decode_jpeg

            try:
                return decode_jpeg(buf)
            except Exception:
                return None
        if self.fake_missing:
            # STUB: codecs that genuinely need absent libraries
            # (webp/heic/mp3) — deterministic fake.  Video is REAL:
            # raw GRV1 (sources/rawvideo.py) and inter-frame GRV2
            # (sources/deltavideo.py)
            h = hashlib.blake2b(buf, digest_size=3).digest()
            return np.full((1, 1, 3), np.frombuffer(h, dtype=np.uint8).reshape(1, 1, 3))
        raise NotImplementedError(f"no codec for fmt={fmt!r} in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.tiff import fast_layout_arrow

        col = batch.column("bytes")
        n = batch.num_rows
        mean_r = np.full(n, np.nan)
        mean_g = np.full(n, np.nan)
        mean_b = np.full(n, np.nan)
        ok = np.zeros(n, dtype=bool)
        phash = np.zeros(n, dtype=np.int64)
        # canonical-layout fast path: means + hash computed per row over
        # ZERO-COPY strip views (reshape of a view, C-kernel mean) — no
        # per-row IFD walk, no pixel copy, no gather temporaries (a
        # whole-group int64 index matrix would be 8x the payload bytes;
        # round-3 review)
        data, start, _length, fok, w, h, so, sl = fast_layout_arrow(col)
        is_tiff = np.array(
            [f == "tiff" for f in batch.column("fmt").to_pylist()], dtype=bool
        )
        fast = fok & is_tiff
        if fast.any():
            for i in np.nonzero(fast)[0]:
                s0 = start[i] + so[i]
                strip = data[s0 : s0 + sl[i]]
                m = strip.reshape(-1, 3).mean(axis=0)
                mean_r[i], mean_g[i], mean_b[i] = m
                phash[i] = np.int64(
                    np.uint64(
                        int.from_bytes(hashlib.blake2b(strip, digest_size=8).digest(), "little")
                    )
                )
            ok[fast] = True
        slow = np.nonzero(~fast)[0]
        if len(slow):
            # materialize ONLY the rows that need the generic parser
            take = pa.array(slow, type=pa.int64())
            bufs = dict(zip(slow.tolist(), col.take(take).to_pylist()))
            fmts = dict(zip(slow.tolist(), batch.column("fmt").take(take).to_pylist()))
            for i in slow:
                pix = self._decode(bufs[i], fmts[i])
                if pix is None:
                    continue
                ok[i] = True
                mean_r[i] = float(pix[:, :, 0].mean())
                mean_g[i] = float(pix[:, :, 1].mean())
                mean_b[i] = float(pix[:, :, 2].mean())
                phash[i] = np.int64(
                    np.uint64(int.from_bytes(hashlib.blake2b(pix.tobytes(), digest_size=8).digest(), "little"))
                )
        out = batch.drop_columns(["bytes"])  # pixels stop here
        out = out.append_column("decode_ok", pa.array(ok))
        out = out.append_column("mean_r", pa.array(mean_r, type=pa.float64()))
        out = out.append_column("mean_g", pa.array(mean_g, type=pa.float64()))
        out = out.append_column("mean_b", pa.array(mean_b, type=pa.float64()))
        out = out.append_column("pixel_hash", pa.array(phash, type=pa.int64()))
        return out


class ImageResize:
    """Actor stage: nearest-neighbor resize to (target_w, target_h).

    Real for TIFF payloads (pure numpy index sampling); emits resized
    payloads re-encoded as raw RGB bytes + new dims.
    """

    def __init__(self, target_w: int = 8, target_h: int = 8):
        self.tw = target_w
        self.th = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.tiff import fast_layout_arrow

        col = batch.column("bytes")
        n = batch.num_rows
        out_bytes: list = [None] * n
        # canonical-layout fast path: the nearest-neighbor SAMPLE PATTERN
        # for a (w, h) shape is one flat index array into the strip, so a
        # whole same-shape group resizes as a single gather — pixels are
        # sampled straight out of the zero-copy payload buffer without
        # ever materializing the full image
        data, start, _length, fok, w, h, so, _sl = fast_layout_arrow(col)
        if fok.any():
            shapes = np.unique(np.stack([w[fok], h[fok]]), axis=1).T
            for wv, hv in shapes:
                grp = np.nonzero(fok & (w == wv) & (h == hv))[0]
                yi = (np.arange(self.th, dtype=np.int64) * hv // self.th).clip(0, hv - 1)
                xi = (np.arange(self.tw, dtype=np.int64) * wv // self.tw).clip(0, wv - 1)
                pat = ((yi[:, None] * wv + xi[None, :]) * 3)[:, :, None] + np.arange(3, dtype=np.int64)
                pat_flat = pat.ravel()
                # per-row gather keeps the index temporary O(th*tw*3)
                # instead of a whole-group int64 matrix (8 bytes per
                # sampled output byte; round-3 review)
                s0 = start[grp] + so[grp]
                for k, i in enumerate(grp):
                    out_bytes[i] = data[s0[k] + pat_flat].tobytes()
        slow = np.nonzero(~fok)[0]
        if len(slow):
            from ..sources.jpeg import decode_jpeg
            from ..sources.png import decode_png

            # materialize ONLY the non-canonical rows
            bufs = dict(zip(slow.tolist(), col.take(pa.array(slow, type=pa.int64())).to_pylist()))
            for i in slow:
                try:
                    buf = bufs[i]
                    kind = sniff_format(buf)
                    if kind == "png":
                        pix = decode_png(buf)
                    elif kind == "jpeg":
                        pix = decode_jpeg(buf)
                    else:
                        pix = parse_pixels(buf)
                    hh, ww = pix.shape[:2]
                    yi = (np.arange(self.th) * hh // self.th).clip(0, hh - 1)
                    xi = (np.arange(self.tw) * ww // self.tw).clip(0, ww - 1)
                    out_bytes[i] = pix[yi][:, xi].tobytes()
                except Exception:
                    continue  # undecodable/degenerate payload -> null row
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column("resized_rgb", pa.array(out_bytes, type=pa.binary()))
        out = out.append_column("rw", pa.array(np.full(n, self.tw, dtype=np.int32), type=pa.int32()))
        out = out.append_column("rh", pa.array(np.full(n, self.th, dtype=np.int32), type=pa.int32()))
        return out


class AudioFeatureStub:
    """Audio feature extraction — STUB (no audio libs in this sandbox).

    Keeps the actor-pool signature and output schema real: emits a
    fixed-size float32 feature vector per payload, deterministically
    derived from the payload hash, or raises when ``strict``.
    """

    def __init__(self, n_features: int = 16, strict: bool = False):
        self.n_features = n_features
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError("audio decode unavailable in this environment")
        bufs = batch.column("bytes").to_pylist()
        feats = []
        for buf in bufs:
            h = hashlib.blake2b(buf or b"", digest_size=self.n_features * 4).digest()
            feats.append(np.frombuffer(h, dtype=np.uint32).astype(np.float32) / np.float32(2**32))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column(
            "features", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32(), self.n_features))
        )
        return out


class ImageTranscode:
    """Actor stage: re-encode image payloads to a target format
    (round 4 — all three engine codecs are real: tiff/png/jpeg).

    Decodes by fmt column (falling back to signature sniffing), encodes
    to ``target_fmt``; undecodable rows emit null payloads.  Output
    replaces ``bytes``/``fmt`` in place so the stage composes with the
    other payload stages."""

    def __init__(self, target_fmt: str = "png", quality: int = 90):
        if target_fmt not in ("tiff", "png", "jpeg"):
            raise ValueError(f"unsupported target_fmt {target_fmt!r}")
        self.target_fmt = target_fmt
        self.quality = quality
        self._decode = ImageDecode(fake_missing=False)._decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources import tiff
        from ..sources.jpeg import encode_jpeg
        from ..sources.png import encode_png

        bufs = batch.column("bytes").to_pylist()
        fmts = (
            batch.column("fmt").to_pylist()
            if "fmt" in batch.column_names
            else [self._sniff(b) for b in bufs]
        )
        out_bytes: list = [None] * batch.num_rows
        for i, (buf, fmt) in enumerate(zip(bufs, fmts)):
            if not buf:
                continue
            try:
                pix = self._decode(buf, fmt or self._sniff(buf))
            except NotImplementedError:
                continue
            if pix is None:
                continue
            if self.target_fmt == "tiff":
                out_bytes[i] = tiff.encode_tiff(pix, 0, 0)
            elif self.target_fmt == "png":
                out_bytes[i] = encode_png(pix)
            else:
                out_bytes[i] = encode_jpeg(pix, self.quality)
        keep = [c for c in batch.column_names if c not in ("bytes", "fmt")]
        out = batch.select(keep)
        out = out.append_column("bytes", pa.array(out_bytes, type=pa.binary()))
        out = out.append_column(
            "fmt", pa.array([self.target_fmt if b is not None else None for b in out_bytes], type=pa.string())
        )
        return out

    _sniff = staticmethod(sniff_format)


class FrameSampleStub:
    """Video frame sampling — STUB: emits deterministic frame indices for
    a given fps/duration metadata, no real decode."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames = batch.column("n_frames").to_numpy(zero_copy_only=False) if "n_frames" in batch.column_names else np.full(batch.num_rows, 0)
        idx = [list(range(0, int(nf), self.every_n)) for nf in n_frames]
        return batch.append_column("frame_indices", pa.array(idx, type=pa.list_(pa.int32())))


class FrameSample:
    """Actor stage: REAL frame sampling over the engine raw-video
    container (``sources/rawvideo.py``, round 4) — every ``every_n``-th
    frame is sliced out of the payload and emitted as raw RGB bytes
    with its index; compressed containers (mp4/webm) still raise,
    matching the codec-stub policy.  Payload column dropped on output;
    per-row output is bounded by the sampled frames, not the clip."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.rawvideo import extract_frames, video_info

        bufs = batch.column("bytes").to_pylist()
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        idx_out: list = [[] for _ in range(n)]
        frames_out: list = [[] for _ in range(n)]
        fw = np.zeros(n, dtype=np.int32)
        fh = np.zeros(n, dtype=np.int32)
        for i, buf in enumerate(bufs):
            if not buf:
                continue
            try:
                w, h, nf, _fps = video_info(buf)
            except ValueError:
                continue
            ok[i] = True
            fw[i], fh[i] = w, h
            idx = np.arange(0, nf, self.every_n, dtype=np.int64)
            idx_out[i] = idx.tolist()
            frames_out[i] = [f.tobytes() for f in extract_frames(buf, idx)]
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column("video_ok", pa.array(ok))
        out = out.append_column("fw", pa.array(fw, type=pa.int32()))
        out = out.append_column("fh", pa.array(fh, type=pa.int32()))
        out = out.append_column("frame_indices", pa.array(idx_out, type=pa.list_(pa.int32())))
        out = out.append_column("frames_rgb", pa.array(frames_out, type=pa.list_(pa.binary())))
        return out


class ImagePHash:
    """Actor stage: 64-bit DCT perceptual hash per image payload.

    The image-native near-dup fingerprint (pHash): decode -> luma ->
    area-mean downsample to ``size`` x ``size`` -> 2-D orthonormal
    DCT-II -> keep the top-left ``keep`` x ``keep`` low-frequency block
    minus the DC term (63 coefficients) -> threshold at the EXACT
    median (63 is odd, so the middle order statistic is unique and the
    hash is deterministic) -> pack sign bits.  Near-identical pixels
    give near-identical low-frequency spectra, so visual duplicates
    land within a small Hamming distance regardless of high-frequency
    noise — the image counterpart of SimHash over text.

    Setup cost (DCT basis) paid once per actor; the per-batch path
    stacks the resized lumas and hashes the whole batch with two
    batched matmuls (einsum) — no per-pixel Python.
    """

    def __init__(self, size: int = 32, keep: int = 8):
        self.size = size
        self.keep = keep
        n = np.arange(size, dtype=np.float64)
        k = np.arange(size, dtype=np.float64)
        d = np.sqrt(2.0 / size) * np.cos(np.pi * (2.0 * n[None, :] + 1.0) * k[:, None] / (2.0 * size))
        d[0, :] *= 1.0 / np.sqrt(2.0)
        self.dct = d
        self.shifts = np.arange(keep * keep - 1, dtype=np.uint64)

    def _luma32(self, pix: np.ndarray) -> np.ndarray:
        """uint8 [h, w, 3] -> float64 [size, size] mean-pooled luma."""
        p = pix.astype(np.int64)
        g = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
        h, w = g.shape
        s = self.size
        if h < s:
            g = g[(np.arange(s) * h) // s]
            h = s
        if w < s:
            g = g[:, (np.arange(s) * w) // s]
            w = s
        rb = (np.arange(s, dtype=np.int64) * h) // s
        cb = (np.arange(s, dtype=np.int64) * w) // s
        rn = np.diff(np.append(rb, h)).astype(np.float64)
        cn = np.diff(np.append(cb, w)).astype(np.float64)
        pooled = np.add.reduceat(np.add.reduceat(g.astype(np.float64), rb, axis=0), cb, axis=1)
        return pooled / (rn[:, None] * cn[None, :])

    def hash_images(self, lumas: np.ndarray) -> np.ndarray:
        """[n, size, size] float64 -> [n] int64 pHash (63 bits used)."""
        c = np.einsum("ij,njk,lk->nil", self.dct, lumas, self.dct)
        k = self.keep
        flat = c[:, :k, :k].reshape(len(lumas), k * k)[:, 1:]  # drop DC
        med = np.median(flat, axis=1)
        bits = (flat > med[:, None]).astype(np.uint64)
        return (bits << self.shifts[None, :]).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.jpeg import decode_jpeg
        from ..sources.png import decode_png
        from ..sources.tiff import parse_pixels

        bufs = batch.column("bytes").to_pylist()
        lumas = []
        ok = np.zeros(len(bufs), dtype=bool)
        for i, buf in enumerate(bufs):
            try:
                kind = sniff_format(buf)
                if kind == "png":
                    pix = decode_png(buf)
                elif kind == "jpeg":
                    pix = decode_jpeg(buf)
                else:
                    pix = parse_pixels(buf)
                lumas.append(self._luma32(pix))
                ok[i] = True
            except Exception:
                continue  # undecodable payload -> null phash row
        ph = np.zeros(len(bufs), dtype=np.int64)
        if lumas:
            ph[ok] = self.hash_images(np.stack(lumas))
        keep = [c for c in batch.column_names if c != "bytes"]
        out = batch.select(keep)
        out = out.append_column("phash", pa.array(ph, type=pa.int64(), mask=~ok))
        for b in range(4):
            band = (ph >> (16 * b)) & 0xFFFF
            out = out.append_column(
                f"ph_band{b}", pa.array(band.astype(np.int32), type=pa.int32(), mask=~ok)
            )
        return out
