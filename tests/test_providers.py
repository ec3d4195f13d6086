"""Provider protocol + UnixTime (S8) + coercion shim (S5) tests."""

import pyarrow as pa
import pytest

from geocoding_ray.functions.normalize import coerce_to_string
from geocoding_ray.functions.timeutil import UnixTime, timestamp_to_unix_seconds, unix_seconds_to_timestamp
from geocoding_ray.providers import Provider, get_provider, providers, register_provider


class TestProviders:
    def test_builtin_registry(self):
        assert set(providers()) >= {"opencage", "openstreetmap", "geoadmin"}
        # empty-result split mirrors the reference (opencage.rs:370-372
        # vs geoadmin.rs:295-304)
        assert get_provider("opencage").strict_nonempty
        assert not get_provider("geoadmin").strict_nonempty
        assert get_provider("geoadmin").default_sr == "2056"

    def test_render_dispatch(self):
        comps = {"road": "Carrer de Calatrava", "house_number": "64", "postcode": "08017", "city": "Barcelona", "country": "Spain"}
        assert get_provider("opencage").render_reverse(comps, None) == "Carrer de Calatrava, 64, 08017 Barcelona, Spain"
        assert "Barcelona" in get_provider("openstreetmap").render_reverse(comps, None)
        ga = {"strname_deinr": "Seftigenstrasse 264", "dplz4": 3084, "dplzname": "Wabern"}
        assert get_provider("geoadmin").render_reverse(ga, None) == "Seftigenstrasse 264, 3084 Wabern"

    def test_register_new_provider(self):
        p = Provider("testprov", lambda c, l=None: c.get("city"), strict_nonempty=False)
        register_provider(p)
        assert get_provider("testprov").render_reverse({"city": "X"}, None) == "X"
        with pytest.raises(ValueError):
            register_provider(p)

    def test_unknown_provider(self):
        with pytest.raises(KeyError):
            get_provider("nope")


class TestEnvelope:
    def test_opencage_envelope_fields(self):
        from geocoding_ray.functions.envelope import FREE_TIER_DAILY_LIMIT, opencage_envelope

        env = opencage_envelope(total_results=3, created_unix=1710892805, metrics={"rows": 100})
        # schema parity with OpencageResponse (opencage.rs:551-564)
        assert set(env) == {
            "documentation",
            "licenses",
            "rate",
            "status",
            "stay_informed",
            "thanks",
            "timestamp",
            "total_results",
        }
        assert env["status"] == {"code": 200, "message": "OK"}
        assert env["total_results"] == 3
        assert env["timestamp"]["created_unix"] == 1710892805
        assert env["thanks"] == "For using an OpenCage Data API"  # opencage.rs:542
        assert set(env["stay_informed"]) == {"blog", "twitter"}  # opencage.rs:538-541
        assert env["rate"]["limit"] == FREE_TIER_DAILY_LIMIT
        assert env["rate"]["remaining"] == FREE_TIER_DAILY_LIMIT - 100
        assert env["rate"]["reset"] % 86400 == 0

    def test_created_http_reference_fixed_point(self):
        # exact example string from opencage.rs:544
        from geocoding_ray.functions.envelope import created_http

        assert created_http(1523277181) == "Mon, 09 Apr 2018 12:33:01 GMT"

    def test_rate_floors_at_zero(self):
        from geocoding_ray.functions.envelope import opencage_envelope

        env = opencage_envelope(0, 0, metrics={"rows": 10**9})
        assert env["rate"]["remaining"] == 0


class TestUnixTime:
    def test_roundtrip(self):
        t = UnixTime.from_seconds(1_700_000_000)
        assert t.as_seconds() == 1_700_000_000

    def test_arrow_conversions(self):
        col = pa.array([0, 1_700_000_000], type=pa.int64())
        ts = unix_seconds_to_timestamp(col)
        assert ts.type == pa.timestamp("s")
        back = timestamp_to_unix_seconds(ts)
        assert back.to_pylist() == [0, 1_700_000_000]


class TestCoercion:
    def test_string_or_int(self):
        # deserialize_string_or_int semantics (opencage.rs:73-88)
        assert coerce_to_string(756) == "756"
        assert coerce_to_string("756") == "756"
        assert coerce_to_string(None) is None
        assert coerce_to_string(7.0) == "7"
        assert coerce_to_string(True) == "true"
