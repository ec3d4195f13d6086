"""PNG and WAV codec tests (round 4 — the multimodal stubs became real
stdlib-only codecs: sources/png.py, sources/wav.py, stages/audio.py)."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geocoding_ray.sources.png import _SIG, _chunk, decode_png, encode_png
from geocoding_ray.sources.wav import decode_wav, encode_wav


def _png_with_filter(pix: np.ndarray, ftype: int) -> bytes:
    """Reference per-pixel encoder for an arbitrary PNG filter type —
    independent of the production decoder's vectorized unfilter."""
    h, w = pix.shape[:2]
    prev = np.zeros(w * 3, dtype=np.int64)
    rows = []
    for y in range(h):
        cur = pix[y].reshape(-1).astype(np.int64)
        r = np.zeros(w * 3, dtype=np.int64)
        for x in range(w * 3):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            r[x] = (cur[x] - pred) & 0xFF
        rows.append(np.concatenate([[ftype], r]))
        prev = cur
    raw = np.array(rows, dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw.tobytes())) + _chunk(b"IEND", b"")


class TestPNG:
    def test_roundtrip_shapes(self):
        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (2, 3), (16, 16), (9, 31)]:
            pix = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert (decode_png(encode_png(pix)) == pix).all()

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_all_filter_types_decode(self, ftype):
        rng = np.random.default_rng(100 + ftype)
        pix = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
        assert (decode_png(_png_with_filter(pix, ftype)) == pix).all()

    def test_rejects_unsupported_and_corrupt(self):
        pix = np.zeros((2, 2, 3), dtype=np.uint8)
        good = encode_png(pix)
        for bad in (b"", b"notapng", good[:20]):
            with pytest.raises(ValueError):
                decode_png(bad)
        # grayscale profile (ctype 0) is out of scope -> ValueError
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        gray = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2)) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            decode_png(gray)

    @settings(max_examples=50, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31),
    )
    def test_roundtrip_property(self, h, w, seed):
        pix = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(pix)) == pix).all()

    def test_image_decode_stage_handles_png(self):
        from geocoding_ray.stages.image_ops import ImageDecode

        pix = np.full((4, 4, 3), 17, dtype=np.uint8)
        batch = pa.table(
            {
                "image_id": ["p1", "p2"],
                "bytes": pa.array([encode_png(pix), b"corrupt"], type=pa.binary()),
                "fmt": ["png", "png"],
            }
        )
        out = ImageDecode(fake_missing=False)(batch).to_pylist()
        assert out[0]["decode_ok"] and out[0]["mean_r"] == 17.0
        assert not out[1]["decode_ok"]

    def test_image_resize_stage_handles_png(self):
        from geocoding_ray.stages.image_ops import ImageResize

        rng = np.random.default_rng(3)
        pix = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        batch = pa.table(
            {"image_id": ["p"], "bytes": pa.array([encode_png(pix)], type=pa.binary())}
        )
        out = ImageResize(target_w=4, target_h=4)(batch).to_pylist()[0]
        expect = pix[::2][:, ::2]  # nearest-neighbor 8->4 samples even indices
        assert out["resized_rgb"] == expect.tobytes()


class TestWAV:
    def test_roundtrip_mono_stereo(self):
        rng = np.random.default_rng(11)
        mono = rng.integers(-32768, 32767, 500).astype(np.int16)
        r, d = decode_wav(encode_wav(mono, rate=8000))
        assert r == 8000 and (d[:, 0] == mono).all()
        stereo = rng.integers(-32768, 32767, (300, 2)).astype(np.int16)
        r, d = decode_wav(encode_wav(stereo, rate=44100))
        assert r == 44100 and d.shape == (300, 2) and (d == stereo).all()

    def test_8bit_recentered(self):
        # hand-build an 8-bit PCM file: spec stores UNSIGNED bytes
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        data = bytes([0, 128, 255])
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        buf = b"RIFF" + struct.pack("<I", len(body)) + body
        _, d = decode_wav(buf)
        assert d[:, 0].tolist() == [-128, 0, 127]

    def test_rejects_non_pcm_and_corrupt(self):
        with pytest.raises(ValueError):
            decode_wav(b"")
        with pytest.raises(ValueError):
            decode_wav(b"RIFF\x04\x00\x00\x00WAVE")
        # float PCM (format 3) out of scope
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
        with pytest.raises(ValueError):
            decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)

    def test_audio_features_stage(self):
        from geocoding_ray.stages.audio import AudioFeatures

        s = np.array([100, -100, 200, -200, 0], dtype=np.int16)
        batch = pa.table(
            {
                "clip_id": [1, 2, 3],
                "bytes": pa.array([encode_wav(s, rate=16000), b"junk", None], type=pa.binary()),
            }
        )
        out = AudioFeatures()(batch).to_pylist()
        r0 = out[0]
        assert r0["audio_ok"] and r0["sample_rate"] == 16000 and r0["n_samples"] == 5
        assert r0["peak_abs"] == 200
        assert r0["sum_sq"] == 100**2 + 100**2 + 200**2 + 200**2
        # sign flips: +,-,+,-,0 -> crossings at 4 boundaries (0 counts as >= 0)
        assert r0["zero_crossings"] == 4
        assert not out[1]["audio_ok"] and not out[2]["audio_ok"]
        assert "bytes" not in {k for r in out for k in r}


class TestRawVideo:
    def test_roundtrip_and_sampling(self):
        from geocoding_ray.sources.rawvideo import encode_rawvideo, extract_frames, video_info

        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (25, 4, 6, 3), dtype=np.uint8)
        buf = encode_rawvideo(frames, fps=10)
        assert video_info(buf) == (6, 4, 25, 10)
        got = extract_frames(buf, np.array([0, 10, 24]))
        assert (got == frames[[0, 10, 24]]).all()
        with pytest.raises(ValueError):
            extract_frames(buf, np.array([25]))
        with pytest.raises(ValueError):
            video_info(b"mp4 junk")
        with pytest.raises(ValueError):
            video_info(buf[:-1])  # truncated payload

    def test_frame_sample_stage(self):
        from geocoding_ray.sources.rawvideo import encode_rawvideo
        from geocoding_ray.stages.image_ops import FrameSample

        rng = np.random.default_rng(6)
        frames = rng.integers(0, 256, (23, 2, 3, 3), dtype=np.uint8)
        batch = pa.table(
            {
                "clip_id": [1, 2],
                "bytes": pa.array([encode_rawvideo(frames), b"mp4 soup"], type=pa.binary()),
            }
        )
        out = FrameSample(every_n=10)(batch).to_pylist()
        assert out[0]["video_ok"] and out[0]["frame_indices"] == [0, 10, 20]
        assert out[0]["frames_rgb"][1] == frames[10].tobytes()
        assert out[0]["fw"] == 3 and out[0]["fh"] == 2
        assert not out[1]["video_ok"] and out[1]["frames_rgb"] == []
        assert all("bytes" not in r for r in out)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else float(10 * np.log10(255**2 / mse))


class TestJPEG:
    def _structured(self, h=48, w=64):
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        return np.stack(
            [(x * 2 + y) % 256, (x + y * 3) % 256, (255 - (x + y) // 2) % 256], axis=-1
        ).astype(np.uint8)

    def test_psnr_invariant_at_default_quality(self):
        """The input contract's lossy per-row invariant: decoded pixels
        within PSNR >= 40 dB of the source at the default quality."""
        from geocoding_ray.sources.jpeg import decode_jpeg, encode_jpeg

        pix = self._structured()
        assert _psnr(pix, decode_jpeg(encode_jpeg(pix, quality=90))) >= 40.0
        grad = np.stack([np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (48, 1))] * 3, axis=-1)
        assert _psnr(grad, decode_jpeg(encode_jpeg(grad, quality=90))) >= 40.0

    def test_quality_monotone_and_odd_shapes(self):
        from geocoding_ray.sources.jpeg import decode_jpeg, encode_jpeg

        pix = self._structured(13, 17)  # non-multiple-of-8 edges
        p75 = _psnr(pix, decode_jpeg(encode_jpeg(pix, 75)))
        p95 = _psnr(pix, decode_jpeg(encode_jpeg(pix, 95)))
        p100 = _psnr(pix, decode_jpeg(encode_jpeg(pix, 100)))
        assert p75 <= p95 <= p100 and p100 >= 50.0
        assert decode_jpeg(encode_jpeg(pix, 90)).shape == (13, 17, 3)

    def test_rejects_corrupt_and_out_of_profile(self):
        from geocoding_ray.sources.jpeg import decode_jpeg, encode_jpeg

        good = encode_jpeg(self._structured(8, 8))
        for bad in (b"", b"\xff\xd8junk", good[:50], good[:-30]):
            with pytest.raises(ValueError):
                decode_jpeg(bad)
        # progressive SOF2 must be rejected, not mis-decoded
        prog = bytearray(good)
        idx = bytes(prog).find(b"\xff\xc0")
        prog[idx + 1] = 0xC2
        with pytest.raises(ValueError):
            decode_jpeg(bytes(prog))

    def test_image_decode_stage_handles_jpeg(self):
        from geocoding_ray.sources.jpeg import encode_jpeg
        from geocoding_ray.stages.image_ops import ImageDecode

        pix = np.full((8, 8, 3), 100, dtype=np.uint8)
        batch = pa.table(
            {
                "image_id": ["j1", "j2"],
                "bytes": pa.array([encode_jpeg(pix, 95), b"\xff\xd8corrupt"], type=pa.binary()),
                "fmt": ["jpeg", "jpeg"],
            }
        )
        out = ImageDecode(fake_missing=False)(batch).to_pylist()
        assert out[0]["decode_ok"] and abs(out[0]["mean_r"] - 100.0) < 2.0
        assert not out[1]["decode_ok"]

    def test_image_resize_stage_handles_jpeg(self):
        from geocoding_ray.sources.jpeg import encode_jpeg
        from geocoding_ray.stages.image_ops import ImageResize

        pix = self._structured(16, 16)
        batch = pa.table({"image_id": ["j"], "bytes": pa.array([encode_jpeg(pix, 95)], type=pa.binary())})
        out = ImageResize(target_w=4, target_h=4)(batch).to_pylist()[0]
        assert out["resized_rgb"] is not None and len(out["resized_rgb"]) == 4 * 4 * 3


class TestTranscode:
    def test_cross_format_roundtrips(self):
        from geocoding_ray.sources import tiff
        from geocoding_ray.sources.png import decode_png
        from geocoding_ray.stages.image_ops import ImageTranscode

        rng = np.random.default_rng(9)
        pix = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        batch = pa.table(
            {
                "image_id": ["t", "x"],
                "bytes": pa.array([tiff.encode_tiff(pix, 0, 0), b"garbage"], type=pa.binary()),
                "fmt": ["tiff", "unknown"],
            }
        )
        out = ImageTranscode(target_fmt="png")(batch).to_pylist()
        # tiff -> png is lossless: decoded png must equal the source pixels
        assert (decode_png(out[0]["bytes"]) == pix).all() and out[0]["fmt"] == "png"
        assert out[1]["bytes"] is None and out[1]["fmt"] is None

    def test_tiff_to_jpeg_meets_psnr(self):
        from geocoding_ray.sources import tiff
        from geocoding_ray.sources.jpeg import decode_jpeg
        from geocoding_ray.stages.image_ops import ImageTranscode

        x, y = np.meshgrid(np.arange(16), np.arange(16))
        a = x * 3 + y
        pix = np.stack([(a * 255) // a.max()] * 3, axis=-1).astype(np.uint8)
        batch = pa.table(
            {"image_id": ["s"], "bytes": pa.array([tiff.encode_tiff(pix, 0, 0)], type=pa.binary()), "fmt": ["tiff"]}
        )
        out = ImageTranscode(target_fmt="jpeg", quality=90)(batch).to_pylist()[0]
        assert _psnr(pix, decode_jpeg(out["bytes"])) >= 40.0

    def test_sniffing_without_fmt_column(self):
        from geocoding_ray.sources.png import encode_png
        from geocoding_ray.sources.tiff import parse_pixels
        from geocoding_ray.stages.image_ops import ImageTranscode

        pix = np.full((4, 4, 3), 42, dtype=np.uint8)
        batch = pa.table({"image_id": ["p"], "bytes": pa.array([encode_png(pix)], type=pa.binary())})
        out = ImageTranscode(target_fmt="tiff")(batch).to_pylist()[0]
        assert out["fmt"] == "tiff" and (parse_pixels(out["bytes"]) == pix).all()


class TestReviewRegressions:
    def test_transcode_null_rows_compose_with_decode(self):
        """A corrupt payload flows transcode -> decode as decode_ok=False
        rows, never a task error (round-4 review finding 1)."""
        from geocoding_ray.sources import tiff
        from geocoding_ray.stages.image_ops import ImageDecode, ImageTranscode

        pix = np.full((4, 4, 3), 9, dtype=np.uint8)
        batch = pa.table(
            {
                "image_id": ["ok", "bad"],
                "bytes": pa.array([tiff.encode_tiff(pix, 0, 0), b"corrupt"], type=pa.binary()),
                "fmt": ["tiff", "tiff"],
            }
        )
        mid = ImageTranscode(target_fmt="png")(batch)
        for fake in (False, True):
            out = ImageDecode(fake_missing=fake)(mid).to_pylist()
            assert out[0]["decode_ok"] and out[0]["mean_r"] == 9.0
            assert not out[1]["decode_ok"]

    def test_wav_truncated_data_chunk_raises(self):
        """A data chunk declaring more bytes than the buffer holds is
        corrupt, not a short clip (round-4 review finding 2)."""
        buf = bytearray(encode_wav(np.zeros(100, dtype=np.int16)))
        with pytest.raises(ValueError):
            decode_wav(bytes(buf[:-50]))  # cut inside the data chunk

    def test_jpeg_fill_bytes_before_marker(self):
        """T.81 B.1.1.2 fill bytes (extra 0xFF before a marker) must not
        break the parse (round-4 review finding 3)."""
        from geocoding_ray.sources.jpeg import decode_jpeg, encode_jpeg

        pix = np.full((8, 8, 3), 77, dtype=np.uint8)
        good = encode_jpeg(pix, 95)
        idx = good.find(b"\xff\xc0")
        padded = good[:idx] + b"\xff\xff\xff" + good[idx:]
        dec = decode_jpeg(padded)
        assert dec.shape == (8, 8, 3) and abs(float(dec.mean()) - 77.0) < 2.0


def test_image_grad_vs_pixel_loop(ray_session):
    """Vectorized Sobel energy (real codec roundtrip) vs a scalar
    per-pixel reference conv on the same formula pixels."""
    import numpy as np

    from geocoding_ray.pipelines.oracle_queries import _ImageGrad

    import pyarrow as pa

    eids = [0, 1, 7, 200, 255, 256, 1000, 65535]
    got = _ImageGrad()(pa.table({"event_id": pa.array(eids, type=pa.int64())})).to_pandas()
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]])
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]])
    for row in got.itertuples():
        e = row.event_id
        pix = np.zeros((8, 8, 3), dtype=np.int64)
        for r in range(8):
            for c in range(8):
                for k in range(3):
                    pix[r, c, k] = (e + 16 * r + 2 * c + k) % 256
        for ch, col in ((0, "grad_r"), (1, "grad_g"), (2, "grad_b")):
            tot = 0
            for r in range(1, 7):
                for c in range(1, 7):
                    win = pix[r - 1 : r + 2, c - 1 : c + 2, ch]
                    tot += abs(int((kx * win).sum())) + abs(int((ky * win).sum()))
            assert getattr(row, col) == tot
