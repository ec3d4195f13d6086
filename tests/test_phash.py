"""ImagePHash properties: determinism, noise robustness, cross-format
consistency, separation of distinct images."""

from __future__ import annotations

import numpy as np

from geocoding_ray.functions.hashing import hamming64
from geocoding_ray.stages.image_ops import ImagePHash
from geocoding_ray.sources import tiff


def _ham(a: int, b: int) -> int:
    return int(hamming64(np.array([a], dtype=np.uint64), np.array([b], dtype=np.uint64))[0])


def _phash_of(pix: np.ndarray, ph: ImagePHash) -> int:
    return int(ph.hash_images(np.stack([ph._luma32(pix)]))[0])


class TestImagePHash:
    def setup_method(self):
        self.ph = ImagePHash()

    def test_deterministic_and_63_bits(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
        h1 = _phash_of(img, self.ph)
        h2 = _phash_of(img.copy(), self.ph)
        assert h1 == h2
        assert 0 <= h1 < (1 << 63)

    def test_small_perturbation_small_hamming(self):
        rng = np.random.RandomState(1)
        for trial in range(20):
            img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
            pert = img.copy()
            ys, xs = rng.randint(0, 64, 6), rng.randint(0, 64, 6)
            pert[ys, xs] = np.clip(pert[ys, xs].astype(int) + 5, 0, 255).astype(np.uint8)
            assert _ham(_phash_of(img, self.ph), _phash_of(pert, self.ph)) <= 6

    def test_distinct_images_large_hamming(self):
        rng = np.random.RandomState(2)
        hashes = [
            _phash_of(rng.randint(0, 256, (64, 64, 3)).astype(np.uint8), self.ph)
            for _ in range(30)
        ]
        dists = [
            _ham(hashes[i], hashes[j])
            for i in range(30)
            for j in range(i + 1, 30)
        ]
        assert min(dists) > 12  # ~Binomial(63, .5): far from the <=8 dup gate

    def test_brightness_shift_is_near_invariant(self):
        # +10 luma everywhere only moves the DC coefficient (dropped),
        # so the hash barely changes — the property that makes pHash a
        # perceptual (not byte) fingerprint
        rng = np.random.RandomState(3)
        img = rng.randint(0, 200, (64, 64, 3)).astype(np.uint8)
        brighter = np.clip(img.astype(int) + 10, 0, 255).astype(np.uint8)
        assert _ham(_phash_of(img, self.ph), _phash_of(brighter, self.ph)) <= 4

    def test_tiff_roundtrip_preserves_hash(self):
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (48, 56, 3)).astype(np.uint8)
        buf = tiff.encode_tiff(img, 0, 0)
        back = tiff.parse_pixels(buf)
        assert _phash_of(img, self.ph) == _phash_of(back, self.ph)

    def test_batch_call_marks_bad_payload_null(self):
        import pyarrow as pa

        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
        good = tiff.encode_tiff(img, 0, 0)
        batch = pa.table(
            {
                "event_id": pa.array([1, 2], type=pa.int64()),
                "bytes": pa.array([good, b"not an image"], type=pa.binary()),
            }
        )
        out = self.ph(batch)
        assert out.column("phash").is_valid().to_pylist() == [True, False]
        assert int(out.column("phash")[0].as_py()) == _phash_of(img, self.ph)

    def test_resize_path_nonsquare_and_small(self):
        # smaller-than-32 input takes the nearest-upsample path
        rng = np.random.RandomState(6)
        small = rng.randint(0, 256, (16, 20, 3)).astype(np.uint8)
        h = _phash_of(small, self.ph)
        assert 0 <= h < (1 << 63)

    def test_corpus_within_band_guarantee(self):
        """4x16-bit banding only GUARANTEES candidate recall for
        Hamming <= 3; the gated corpus must stay within that bound so
        the exact oracle can never lose a pair to banding.  Pins the
        perturbation amplitude: raise it and this fails before the
        silent gate does."""
        from geocoding_ray.pipelines.oracle_queries import _PhashCorpus

        import pyarrow as pa

        eids = np.arange(0, 400, dtype=np.int64)  # 100 dup groups
        fp = _PhashCorpus()(pa.table({"event_id": pa.array(eids, type=pa.int64())}))
        ph = fp.column("phash").to_numpy(zero_copy_only=False).astype(np.uint64)
        worst = 0
        for b in range(0, 400, 4):
            grp = ph[b : b + 4]
            for i in range(4):
                for j in range(i + 1, 4):
                    worst = max(worst, _ham(int(grp[i]), int(grp[j])))
        assert worst <= 3, f"intra-group Hamming {worst} exceeds the banding guarantee"

    def test_bucket_sizes_far_below_cap(self):
        """The 4096-id bucket cap must never truncate at gated tiers:
        measure the real (band, key) bucket occupancy of a 10k-image
        corpus (sf0.01 scale) and require 100x headroom."""
        from geocoding_ray.pipelines.oracle_queries import _PhashCorpus

        import pyarrow as pa

        eids = np.arange(0, 10_000, dtype=np.int64)
        fp = _PhashCorpus()(pa.table({"event_id": pa.array(eids, type=pa.int64())}))
        worst = 0
        for b in range(4):
            band = fp.column(f"ph_band{b}").to_numpy(zero_copy_only=False)
            _, cnt = np.unique(band, return_counts=True)
            worst = max(worst, int(cnt.max()))
        assert worst <= 40, f"max bucket {worst}; cap headroom eroded"

    def test_empty_batch_ok(self):
        from geocoding_ray.pipelines.oracle_queries import _PhashCorpus

        import pyarrow as pa

        out = _PhashCorpus()(pa.table({"event_id": pa.array([], type=pa.int64())}))
        assert out.num_rows == 0

    def test_scale_invariance_integer_ratio(self):
        # 2x block replication of a 32x32 image mean-pools back to the
        # original luma exactly -> identical hash (scale invariance on
        # the clean integer-ratio path)
        rng = np.random.RandomState(7)
        base = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        big = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
        assert _phash_of(base, self.ph) == _phash_of(big, self.ph)
