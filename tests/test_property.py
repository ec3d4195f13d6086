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


import pyarrow as pa


class TestStreamKernelProperties:
    """Round-3 stream kernels vs brute force under random inputs and
    random batch cuts (the repair paths must be split-invariant)."""

    @settings(max_examples=60, deadline=None)
    @given(
        gaps=st.lists(st.integers(min_value=0, max_value=90), min_size=1, max_size=40),
        cut=st.integers(min_value=0, max_value=40),
    )
    def test_sessionize_split_invariant(self, gaps, cut):
        from geocoding_ray.pipelines.text_queries import (
            SESSION_GAP_US,
            sessionize_merge,
            sessionize_partial,
        )

        minutes = np.cumsum(np.array(gaps, dtype=np.int64))
        n = len(minutes)
        t = pa.table(
            {
                "event_id": pa.array(range(n), type=pa.int64()),
                "user_id": pa.array([1] * n, type=pa.int64()),
                "ts": pa.array(minutes * 60 * 1_000_000, type=pa.int64()).cast(pa.timestamp("us")),
            }
        )
        whole = sessionize_merge(sessionize_partial(t)).to_pylist()
        c = min(cut, n)
        parts = [sessionize_partial(t.slice(0, c)), sessionize_partial(t.slice(c))]
        parts = [p for p in parts if p.num_rows]
        split = sessionize_merge(pa.concat_tables(parts)).to_pylist()
        assert split == whole
        # brute force: session count == boundaries with gap > 30 min
        gap_min = np.diff(minutes)
        want_sessions = 1 + int((gap_min > SESSION_GAP_US // (60 * 1_000_000)).sum())
        assert len(whole) == want_sessions

    @settings(max_examples=60, deadline=None)
    @given(
        kinds=st.lists(st.booleans(), min_size=1, max_size=40),
        cut=st.integers(min_value=0, max_value=40),
    )
    def test_asof_split_invariant_vs_brute(self, kinds, cut):
        from geocoding_ray.pipelines.text_queries import (
            asof_finish_resolved,
            asof_partial,
            asof_repair_user,
        )

        n = len(kinds)
        t = pa.table(
            {
                "event_id": pa.array(range(n), type=pa.int64()),
                "user_id": pa.array([3] * n, type=pa.int64()),
                "ts": pa.array(np.arange(n, dtype=np.int64) * 60_000_000, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": pa.array(["click" if k else "view" for k in kinds], type=pa.string()),
            }
        )
        c = min(cut, n)
        pieces = [asof_partial(t.slice(0, c)), asof_partial(t.slice(c))]
        parts = pa.concat_tables([p for p in pieces if p.num_rows])
        out = asof_finish_resolved(parts).to_pylist()
        rest = parts.filter(pa.array(parts.column("kind").to_numpy(zero_copy_only=False) > 0))
        if rest.num_rows:
            out += asof_repair_user(rest).to_pylist()
        got = {r["event_id"]: r["last_click_ts"] for r in out}
        # brute force carry-forward
        last = None
        for i, k in enumerate(kinds):
            if k:
                last = i
            want = None if last is None else np.datetime64(last * 60_000_000, "us").astype("datetime64[us]").item()
            assert got[i] == want, (i, got[i], want)

    @settings(max_examples=80, deadline=None)
    @given(
        vals=st.lists(
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False).map(lambda v: round(v, 3)),
            min_size=1,
            max_size=60,
        ),
        q=st.sampled_from([0.1, 0.25, 0.5, 0.9, 0.95]),
    )
    def test_quantile_bucket_selection_matches_sort(self, vals, q):
        from geocoding_ray.pipelines.text_queries import _median_key

        v = np.array(vals, dtype=np.float64)
        n = len(v)
        rank = max(0, int(np.ceil(q * n)) - 1)
        want = np.sort(v)[rank]
        bkt = _median_key(v, 1)
        ub, counts = np.unique(bkt, return_counts=True)
        acc = 0
        for b_, c in zip(ub, counts):
            if acc + c > rank:
                got = np.sort(v[bkt == b_])[rank - acc]
                break
            acc += c
        assert got == want


class TestGeoJSONFeatureProperty:
    @settings(max_examples=100, deadline=None)
    @given(
        lons=st.lists(
            st.one_of(st.floats(allow_nan=True, allow_infinity=False, width=64), st.just(float("nan"))),
            min_size=1,
            max_size=8,
        ),
        texts=st.lists(st.one_of(st.none(), st.text(max_size=24)), min_size=8, max_size=8),
        ints=st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)), min_size=8, max_size=8),
        floats=st.lists(
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=64)),
            min_size=8,
            max_size=8,
        ),
    )
    def test_feature_lines_match_json_dumps(self, lons, texts, ints, floats):
        """The kernel-assembled GeoJSON feature line equals per-row
        json.dumps(sort_keys, ensure_ascii=False) for ARBITRARY floats
        (any magnitude/sign, NaN coords), arbitrary unicode/control-char
        strings, big ints and nulls."""
        import json
        import math

        import pyarrow as pa

        from geocoding_ray.sources.geojson import features_from_points

        n = len(lons)
        batch = pa.table(
            {
                "lon": pa.array(lons, type=pa.float64()),
                "lat": pa.array(list(reversed(lons)), type=pa.float64()),
                "s": pa.array(texts[:n], type=pa.string()),
                "i": pa.array(ints[:n], type=pa.int64()),
                "f": pa.array(floats[:n], type=pa.float64()),
            }
        )
        got = [r["feature"] for r in features_from_points(batch).to_pylist()]
        cols = {c: batch.column(c).to_pylist() for c in ("s", "i", "f")}
        lon_l = batch.column("lon").to_pylist()
        lat_l = batch.column("lat").to_pylist()
        for k in range(n):
            lo, la = lon_l[k], lat_l[k]
            geom = (
                None
                if (math.isnan(lo) or math.isnan(la))
                else {"type": "Point", "coordinates": [lo, la]}
            )
            want = json.dumps(
                {
                    "type": "Feature",
                    "geometry": geom,
                    "properties": {c: cols[c][k] for c in ("s", "i", "f")},
                },
                ensure_ascii=False,
                sort_keys=True,
            )
            assert got[k] == want


class TestHLLRankExact:
    @settings(max_examples=200, deadline=None)
    @given(v=st.integers(min_value=1, max_value=(1 << 64) - 1))
    def test_swar_lz_equals_bit_length(self, v):
        """The production _lz64 (smear + SWAR popcount) is exact for
        every uint64 — including the all-ones-prefix values where the
        old float64-log2 path rounded across a power of two."""
        from geocoding_ray.pipelines.text_queries import _lz64

        lz = int(_lz64(np.array([v], dtype=np.uint64))[0])
        assert lz == 64 - int(v).bit_length()
