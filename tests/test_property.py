"""Hypothesis property tests for the geometry kernels and codecs —
engine-side strengthening of the reference's test strategy (SURVEY.md
§5.1 notes the reference has none)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geocoding_ray.config import InputBounds
from geocoding_ray.functions.normalize import normalize_text, tokenize
from geocoding_ray.sources import tiff
from geocoding_ray.state import cells

lon_st = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)
lat_st = st.floats(min_value=-90.0, max_value=89.999999, allow_nan=False)
level_st = st.integers(min_value=1, max_value=29)


class TestCellProperties:
    @settings(max_examples=200, deadline=None)
    @given(lon=lon_st, lat=lat_st, level=level_st)
    def test_encode_contains_point(self, lon, lat, level):
        c = cells.encode(np.array([lon]), np.array([lat]), level)
        minx, miny, maxx, maxy = cells.cell_bounds(c)
        # symmetric tolerance: (lon+180) cancels sub-ulp negatives near
        # cell boundaries (e.g. -2e-16 + 180 rounds to exactly 180.0)
        assert minx[0] - 1e-9 <= lon <= maxx[0] + 1e-9
        assert miny[0] - 1e-9 <= lat <= maxy[0] + 1e-9

    @settings(max_examples=200, deadline=None)
    @given(lon=lon_st, lat=lat_st, level=st.integers(min_value=2, max_value=29), steps=st.integers(1, 5))
    def test_parent_prefix_property(self, lon, lat, level, steps):
        steps = min(steps, level)
        c = cells.encode(np.array([lon]), np.array([lat]), level)
        p = cells.parent(c, steps)
        qk_c = cells.render_quadkey(c)[0]
        qk_p = cells.render_quadkey(p)[0]
        assert qk_c.startswith(qk_p)
        assert len(qk_c) - len(qk_p) == steps

    @settings(max_examples=100, deadline=None)
    @given(lon=lon_st, lat=lat_st, level=st.integers(min_value=1, max_value=12))
    def test_center_reencodes_to_same_cell(self, lon, lat, level):
        c = cells.encode(np.array([lon]), np.array([lat]), level)
        clon, clat = cells.decode_center(c)
        c2 = cells.encode(clon, clat, level)
        assert c2[0] == c[0]


class TestGPSProperties:
    @settings(max_examples=150, deadline=None)
    @given(
        lat_e7=st.integers(min_value=-900000000, max_value=900000000),
        lon_e7=st.integers(min_value=-1800000000, max_value=1800000000),
    )
    def test_tiff_gps_bit_exact_roundtrip(self, lat_e7, lon_e7):
        pix = np.zeros((2, 3, 3), dtype=np.uint8)
        buf = tiff.encode_tiff(pix, lat_e7, lon_e7)
        lon, lat = tiff.parse_gps(buf)
        assert lon == lon_e7 / 1e7
        assert lat == lat_e7 / 1e7
        # the vectorized arrow parser agrees with the generic walker
        import pyarrow as pa

        vlon, vlat, ok = tiff.parse_gps_arrow(pa.array([buf], type=pa.binary()))
        assert ok[0] and vlon[0] == lon and vlat[0] == lat


class TestNormalizeProperties:
    @settings(max_examples=200, deadline=None)
    @given(s=st.text(max_size=80))
    def test_normalize_idempotent(self, s):
        n1 = normalize_text(s)
        assert normalize_text(n1) == n1

    @settings(max_examples=200, deadline=None)
    @given(s=st.text(max_size=80))
    def test_tokens_are_normalized_words(self, s):
        for t in tokenize(s):
            assert t == normalize_text(t)
            assert " " not in t and t != ""


class TestBoundsProperties:
    @settings(max_examples=200, deadline=None)
    @given(
        a=st.floats(-180, 180, allow_nan=False),
        b=st.floats(-90, 90, allow_nan=False),
        c=st.floats(-180, 180, allow_nan=False),
        d=st.floats(-90, 90, allow_nan=False),
    )
    def test_render_roundtrips_through_float(self, a, b, c, d):
        # lib.rs:168-182 — the CSV wire format must round-trip exactly
        s = InputBounds.new((a, b), (c, d)).render()
        parts = [float(x) for x in s.split(",")]
        assert parts == [a, b, c, d]
