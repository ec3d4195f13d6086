"""Golden conformance suite — the reference's inline canned-response tests
ported to engine fixtures (SURVEY.md §5.1, FIXTURES.md §4).

Runs the joiners directly on Arrow batches (no Ray session needed):
the joiner classes accept the bare index, mirroring the reference's
endpoint-injection test pattern (new_with_endpoint, opencage.rs:117)."""

import numpy as np
import pyarrow as pa
import pytest

from geocoding_ray.config import ForwardConfig, InputBounds, ReverseConfig
from geocoding_ray.stages.forward import ForwardJoiner, GazetteerIndex
from geocoding_ray.stages.reverse import AdminIndex, ReverseJoiner


@pytest.fixture(scope="module")
def indexes(world):
    admin, gaz, _ = world
    return AdminIndex(admin, gaz), GazetteerIndex(gaz)


def _reverse(indexes, lon, lat, **cfg):
    idx, _ = indexes
    batch = pa.table({"image_id": ["q"], "lon": [lon], "lat": [lat]})
    out = ReverseJoiner(idx, ReverseConfig(**cfg))(batch)
    return out.to_pylist()[0]


def _forward(indexes, text, **cfg):
    _, gidx = indexes
    batch = pa.table({"image_id": ["q"], "caption": [text]})
    out = ForwardJoiner(gidx, ForwardConfig(**cfg))(batch)
    return out.to_pylist()[0]


class TestReverseGolden:
    def test_opencage_barcelona(self, indexes):
        # opencage.rs:716-736: exact formatted string
        r = _reverse(indexes, 2.12870, 41.40139)
        assert r["formatted"] == "Carrer de Calatrava, 64, 08017 Barcelona, Spain"
        # opencage.rs:782-801 reverse_full: components["road"]
        assert r["road"] == "Carrer de Calatrava"

    def test_opencage_language_fr(self, indexes):
        # opencage.rs:738-759: language=fr changes the rendering
        r = _reverse(indexes, 2.12870, 41.40139, language="fr")
        assert r["formatted"].endswith("Barcelone, Espagne")

    def test_osm_display_name(self, indexes):
        # openstreetmap.rs:454-475: display_name contains the hierarchy
        r = _reverse(indexes, 2.12870, 41.40139, provider="openstreetmap")
        assert "Carrer de Calatrava" in r["formatted"]
        assert "Barcelona" in r["formatted"]

    def test_geoadmin_wabern_pip(self, indexes):
        # geoadmin.rs:662-678: exact "{strname_deinr}, {dplz4} {dplzname}"
        r = _reverse(indexes, 7.451352119445801, 46.92793655395508, provider="geoadmin")
        assert r["formatted"] == "Seftigenstrasse 264, 3084 Wabern"

    def test_miss_returns_null(self, indexes):
        # geoadmin.rs:295-304: empty -> Ok(None); engine: null, no panic
        r = _reverse(indexes, 75.0, -20.0)
        assert r["formatted"] is None
        assert r["match_kind"] == "miss"

    def test_strict_mode_flags_empty(self, indexes):
        # OpenCage/OSM would panic on empty (opencage.rs:370-372);
        # the engine flags the row with the GeocodingError taxonomy
        # variant (lib.rs:59) instead of killing the task.
        from geocoding_ray.functions.errors import REVERSE_EMPTY, GeocodingError

        idx, _ = indexes
        batch = pa.table({"image_id": ["q"], "lon": [75.0], "lat": [-20.0]})
        out = ReverseJoiner(idx, ReverseConfig(strict_nonempty=True))(batch)
        assert out.to_pylist()[0]["error"] == REVERSE_EMPTY
        assert out.to_pylist()[0]["error"].startswith(GeocodingError.REVERSE.value)

    def test_knn_fallback_geoadmin(self, indexes):
        # point just off "Isla 0" (-95, -40) — no polygon, within tolerance
        r = _reverse(indexes, -95.001, -40.001, provider="geoadmin", tolerance_m=20000)
        assert r["match_kind"] == "knn"
        assert r["formatted"] == "Isla Way 0, 9000 Isla 0"

    def test_knn_beyond_tolerance_is_miss(self, indexes):
        r = _reverse(indexes, -95.001, -40.001, provider="geoadmin", tolerance_m=10)
        assert r["match_kind"] == "miss"
        assert r["formatted"] is None

    def test_deepest_polygon_wins(self, indexes):
        # A Barcelona point outside the suburb: city-level answer
        r = _reverse(indexes, 2.25, 41.45)
        assert r["city"] == "Barcelona"
        assert r["suburb"] is None


class TestForwardGolden:
    def test_schwabing_exact_point(self, indexes):
        # opencage.rs:761-780 / openstreetmap.rs:440-452:
        # exactly [Point(11.5884858, 48.1700887)]
        r = _forward(indexes, "Schwabing, München")
        assert len(r["points"]) >= 1
        assert r["points"][0] == {"lon": 11.5884858, "lat": 48.1700887}

    def test_ucl_with_bbox(self, indexes):
        # opencage.rs:803-852 / openstreetmap.rs:410-437
        bb = InputBounds.new((-0.138069, 51.519892), (-0.134271, 51.523197))
        r = _forward(indexes, "UCL Centre for Advanced Spatial Analysis", bbox=bb)
        assert r["n_candidates"] >= 1
        assert "90 Tottenham Court Road" in r["top_label"]

    def test_bbox_excludes(self, indexes):
        bb = InputBounds.new((-0.138069, 51.519892), (-0.134271, 51.523197))
        r = _forward(indexes, "Schwabing, München", bbox=bb)
        assert r["n_candidates"] == 0
        assert r["points"] == []

    def test_moabit_no_bbox(self, indexes):
        # opencage.rs:907-920 (NOBOX)
        r = _forward(indexes, "Moabit, Berlin, Germany", bbox=None)
        assert r["top_label"] == "Moabit, Berlin, Germany"

    def test_geoadmin_wgs84(self, indexes):
        # geoadmin.rs:620-642: WGS84 result
        r = _forward(indexes, "Seftigenstrasse 264, 3084 Wabern")
        p = r["points"][0]
        assert abs(p["lon"] - 7.451352119445801) < 1e-12
        assert abs(p["lat"] - 46.92793655395508) < 1e-12

    def test_geoadmin_lv95_axis_swap(self, indexes):
        # geoadmin.rs:517-536: sr=2056 -> (easting, northing), ~(2600968.75, 1197427.0)
        r = _forward(indexes, "Seftigenstrasse 264, 3084 Wabern", sr="2056")
        p = r["points"][0]
        assert abs(p["lon"] - 2600968.75) < 2.0
        assert abs(p["lat"] - 1197427.0) < 2.0

    def test_origins_filter(self, indexes):
        # geoadmin.rs:69/173: restricting layers drops non-matching origins
        r = _forward(indexes, "Schwabing, München", origins=("address",))
        assert r["n_candidates"] == 0
        r2 = _forward(indexes, "Schwabing, München", origins=("district",))
        assert r2["n_candidates"] >= 1

    def test_limit_topk(self, indexes):
        # many "Maple Street *" places share tokens; limit clips candidates
        r = _forward(indexes, "Maple Street", limit=3)
        assert r["n_candidates"] <= 3

    def test_ranking_deterministic_total_order(self, indexes):
        r1 = _forward(indexes, "Maple Street", limit=10)
        r2 = _forward(indexes, "Maple Street", limit=10)
        assert r1["points"] == r2["points"]

    def test_empty_query(self, indexes):
        r = _forward(indexes, "")
        assert r["points"] == []

    def test_no_match(self, indexes):
        r = _forward(indexes, "zzzz qqqq xxxx")
        assert r["points"] == []


class TestParamBuilders:
    """Drive the pipelines purely through the reference-shaped builders
    (S4/S6/S7) via the from_params adapters."""

    def test_opencage_countrycode_restricts(self, indexes):
        # countrycode threaded like add_optional_param (opencage.rs:55-70):
        # Schwabing is a German place — cc=de keeps it, cc=es drops it
        from geocoding_ray.config import OpencageParams

        _, gidx = indexes
        batch = pa.table({"image_id": ["q"], "caption": ["Schwabing, München"]})
        hit = ForwardJoiner(gidx, ForwardConfig.from_params(OpencageParams(countrycode="de")))(batch)
        assert hit.to_pylist()[0]["n_candidates"] >= 1
        miss = ForwardJoiner(gidx, ForwardConfig.from_params(OpencageParams(countrycode="es")))(batch)
        assert miss.to_pylist()[0]["n_candidates"] == 0
        # comma-separated + case-folded restriction
        multi = ForwardJoiner(gidx, ForwardConfig.from_params(OpencageParams(countrycode="ES,DE")))(batch)
        assert multi.to_pylist()[0]["n_candidates"] >= 1

    def test_opencage_language_via_params(self, indexes):
        # opencage.rs:738-759: language=fr through the builder
        from geocoding_ray.config import OpencageParams

        idx, _ = indexes
        cfg = ReverseConfig.from_params(OpencageParams(language="fr"))
        batch = pa.table({"image_id": ["q"], "lon": [2.12870], "lat": [41.40139]})
        r = ReverseJoiner(idx, cfg)(batch).to_pylist()[0]
        assert r["formatted"].endswith("Barcelone, Espagne")

    def test_osm_params_viewbox_and_addressdetails(self, indexes):
        # openstreetmap.rs:410-437 forward_full: viewbox + addressdetails
        from geocoding_ray.config import OpenstreetmapParams

        _, gidx = indexes
        params = OpenstreetmapParams(query="UCL Centre for Advanced Spatial Analysis").with_addressdetails(
            True
        ).with_viewbox(InputBounds.new((-0.138069, 51.519892), (-0.134271, 51.523197)))
        cfg = ForwardConfig.from_params(params)
        assert cfg.provider == "openstreetmap" and cfg.addressdetails and cfg.bbox is not None
        batch = pa.table({"image_id": ["q"], "caption": [params.query]})
        out = ForwardJoiner(gidx, cfg)(batch).to_pylist()  # addressdetails -> exploded rows
        assert len(out) >= 1
        assert out[0]["rk"] == 1
        assert out[0]["house_number"] == "90"  # AddressDetails role columns

    def test_geoadmin_params_origins_limit(self, indexes):
        # geoadmin.rs:66-101: origins + limit through the builder
        from geocoding_ray.config import GeoAdminParams

        _, gidx = indexes
        params = GeoAdminParams(searchtext="Maple Street").with_origins("address").with_limit(3)
        cfg = ForwardConfig.from_params(params)
        assert cfg.provider == "geoadmin" and cfg.origins == ("address",) and cfg.limit == 3
        batch = pa.table({"image_id": ["q"], "caption": [params.searchtext]})
        r = ForwardJoiner(gidx, cfg)(batch).to_pylist()[0]
        assert 1 <= r["n_candidates"] <= 3


class TestRoundtrip:
    def test_reverse_then_forward_roundtrip(self, indexes):
        # BASELINE.json north_star: forward(reverse(p)) within tolerance of p
        for lon, lat in [(7.451352119445801, 46.92793655395508)]:
            rev = _reverse(indexes, lon, lat, provider="geoadmin")
            assert rev["formatted"]
            fwd = _forward(indexes, rev["formatted"])
            assert fwd["n_candidates"] >= 1
            p = fwd["points"][0]
            assert abs(p["lon"] - lon) < 0.05
            assert abs(p["lat"] - lat) < 0.05


class TestBounds:
    def test_render_matches_rust_display(self):
        # lib.rs:168-182 doctest: "-0.13806939125061035,51.51989264641164,
        # -0.13427138328552246,51.52319875861641"
        bb = InputBounds.new((-0.13806939125061035, 51.51989264641164), (-0.13427138328552246, 51.52319875861641))
        assert bb.render() == "-0.13806939125061035,51.51989264641164,-0.13427138328552246,51.52319875861641"

    def test_render_strips_integral(self):
        assert InputBounds.new((1.0, 2.0), (3.0, 4.5)).render() == "1,2,3,4.5"
