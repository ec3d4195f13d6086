"""Per-row payload invariant tests (BASELINE.json input_hint §5.2.3):
decoded pixels exactly equal the generator's (PSNR trivially >= 40 dB),
GPS roundtrips bit-exactly for e7-grid coordinates."""

import numpy as np

from geocoding_ray.sources import tiff


def test_gps_roundtrip_exact():
    rng = np.random.RandomState(0)
    for _ in range(50):
        lat_e7 = int(rng.randint(-900000000, 900000001))
        lon_e7 = int(rng.randint(-1800000000, 1800000001))
        pix = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
        buf = tiff.encode_tiff(pix, lat_e7, lon_e7)
        lon, lat = tiff.parse_gps(buf)
        assert lon == lon_e7 / 1e7  # bit-exact: same integer/1e7 division
        assert lat == lat_e7 / 1e7


def test_pixels_lossless():
    rng = np.random.RandomState(1)
    pix = rng.randint(0, 256, (33, 17, 3)).astype(np.uint8)
    buf = tiff.encode_tiff(pix, 123, 456)
    out = tiff.parse_pixels(buf)
    assert np.array_equal(out, pix)  # PSNR = inf >= 40 dB


def test_hemisphere_refs():
    pix = np.zeros((2, 2, 3), dtype=np.uint8)
    for lat_e7, lon_e7 in [(10, 20), (-10, 20), (10, -20), (-10, -20)]:
        lon, lat = tiff.parse_gps(tiff.encode_tiff(pix, lat_e7, lon_e7))
        assert lat == lat_e7 / 1e7 and lon == lon_e7 / 1e7


def test_garbage_and_no_gps():
    lon, lat, ok = tiff.parse_gps_batch([b"", b"garbage", b"II*\x00\x00\x00\x00"])
    assert not ok.any()
    from geocoding_ray.sources.fixtures import _encode_tiff_no_gps

    pix = np.zeros((2, 2, 3), dtype=np.uint8)
    assert tiff.parse_gps(_encode_tiff_no_gps(pix)) is None
    # pixels still decode from the GPS-less variant
    assert np.array_equal(tiff.parse_pixels(_encode_tiff_no_gps(pix)), pix)
