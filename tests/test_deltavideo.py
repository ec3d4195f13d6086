"""GRV2 inter-frame delta codec: losslessness on adversarial content,
seek-from-keyframe semantics, RLE chunk edges, I-fallback behavior, and
the closed-form container size the SQL oracle relies on."""

from __future__ import annotations

import numpy as np
import pytest

from geocoding_ray.sources.deltavideo import (
    DEFAULT_KEYINT,
    _parse_table,
    _rle_decode,
    _rle_encode,
    encode_deltavideo,
    extract_frames,
    video_info,
)


class TestRLE:
    def test_roundtrip_run_chunk_edges(self):
        for length in (1, 2, 254, 255, 256, 510, 511, 765):
            d = np.full(length, 7, dtype=np.uint8)
            assert (_rle_decode(_rle_encode(d), length) == d).all()

    def test_roundtrip_random(self):
        rng = np.random.RandomState(0)
        for _ in range(5):
            d = rng.randint(0, 4, rng.randint(1, 2000)).astype(np.uint8)
            assert (_rle_decode(_rle_encode(d), len(d)) == d).all()

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            _rle_decode(_rle_encode(np.full(10, 3, dtype=np.uint8)), 11)


class TestCodec:
    def test_lossless_on_random_content(self):
        """Random frames force mod-256 wraparound residuals and the
        I-fallback path (RLE of noise is bigger than raw)."""
        rng = np.random.RandomState(3)
        frames = rng.randint(0, 256, (25, 8, 8, 3)).astype(np.uint8)
        buf = encode_deltavideo(frames)
        assert (extract_frames(buf, np.arange(25)) == frames).all()
        # noise P-frames fell back to I-frames (real-codec behavior)
        _, types, _ = _parse_table(buf, 25)
        assert (types == 0).all()

    def test_seek_unsorted_and_repeated_indices(self):
        rng = np.random.RandomState(5)
        base = rng.randint(0, 64, (1, 8, 8, 3)).astype(np.uint8)
        frames = (base + (np.arange(30)[:, None, None, None] % 192)).astype(np.uint8)
        buf = encode_deltavideo(frames)
        idx = np.array([17, 3, 29, 0, 9, 9, 17])
        assert (extract_frames(buf, idx) == frames[idx]).all()

    def test_compresses_correlated_content(self):
        rng = np.random.RandomState(7)
        base = rng.randint(0, 64, (1, 16, 16, 3)).astype(np.uint8)
        frames = (base + (np.arange(40)[:, None, None, None] % 192)).astype(np.uint8)
        buf = encode_deltavideo(frames)
        assert len(buf) * 3 < frames.nbytes  # >3x smaller than raw
        assert (extract_frames(buf, np.arange(40)) == frames).all()

    def test_gop_structure_and_info(self):
        frames = np.zeros((20, 4, 4, 3), dtype=np.uint8)
        frames += np.arange(20, dtype=np.uint8)[:, None, None, None]
        buf = encode_deltavideo(frames, fps=24, keyint=8)
        w, h, n, fps, keyint = video_info(buf)
        assert (w, h, n, fps, keyint) == (4, 4, 20, 24, 8)
        _, types, _ = _parse_table(buf, 20)
        assert np.nonzero(types == 0)[0].tolist() == [0, 8, 16]

    def test_closed_form_size_matches_oracle_formula(self):
        """The SQL_VIDEO_DELTA formula: header 24 + table 5n +
        192*ceil(n/8) + 2*(n - ceil(n/8)) for gradient+fill clips."""
        r = np.arange(8).reshape(8, 1, 1)
        c = np.arange(8).reshape(1, 8, 1)
        k = np.arange(3).reshape(1, 1, 3)
        grad = ((2 * r + c + k) % 32).astype(np.uint8)
        for e in (0, 1, 12345, 99991):
            n = 20 + e % 11
            fills = ((e * 7 + np.arange(n) * 13) % 192).astype(np.uint8)
            frames = (grad[None] + fills[:, None, None, None]).astype(np.uint8)
            buf = encode_deltavideo(frames, keyint=DEFAULT_KEYINT)
            n_i = -(-n // 8)
            assert len(buf) == 24 + 5 * n + 192 * n_i + 2 * (n - n_i)

    def test_corrupt_payloads_raise(self):
        frames = np.zeros((3, 4, 4, 3), dtype=np.uint8)
        buf = encode_deltavideo(frames)
        with pytest.raises(ValueError):
            video_info(b"GRV1" + buf[4:])
        with pytest.raises(ValueError):
            extract_frames(buf[:-1], np.array([0]))
        with pytest.raises(ValueError):
            extract_frames(buf, np.array([3]))
