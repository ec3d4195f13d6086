"""Spatial range join: brute-force parity, disk-cover conservativeness,
antimeridian wrap, and the haversine-oracle boundary margin."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from geocoding_ray.pipelines import range_join as rj
from geocoding_ray.state.distance import haversine_m, planar_sq_deg


def _pairs_brute(qlon, qlat, qid, plon, plat, pid, radius, metric):
    if metric == "planar":
        d = planar_sq_deg(qlon[:, None], qlat[:, None], plon[None, :], plat[None, :])
        keep = d <= radius * radius
    else:
        d = haversine_m(qlon[:, None], qlat[:, None], plon[None, :], plat[None, :])
        keep = d <= radius
    qi, pi = np.nonzero(keep)
    return set(zip(qid[qi].tolist(), pid[pi].tolist()))


def _run(qlon, qlat, plon, plat, radius, metric, level):
    import ray.data as rd

    pts = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(np.arange(len(qlon)), type=pa.int64()),
                "lon": pa.array(qlon, type=pa.float64()),
                "lat": pa.array(qlat, type=pa.float64()),
            }
        )
    )
    pls = rd.from_arrow(
        pa.table(
            {
                "place_id": pa.array(np.arange(len(plon)), type=pa.int64()),
                "lon": pa.array(plon, type=pa.float64()),
                "lat": pa.array(plat, type=pa.float64()),
            }
        )
    )
    out = rj.run_range_join(pts, pls, radius=radius, cell_level=level, metric=metric)
    return {(r["event_id"], r["place_id"]) for r in out.take_all()}


class TestRangeJoin:
    @pytest.mark.parametrize("metric,radius", [("planar", 3.0), ("haversine", 300_000.0)])
    @pytest.mark.parametrize("level", [3, 5, 7])
    def test_matches_brute_force(self, ray_session, metric, radius, level):
        rng = np.random.RandomState(7)
        nq, npl = 400, 60
        qlon = rng.uniform(-179, 179, nq)
        qlat = rng.uniform(-85, 85, nq)
        plon = rng.uniform(-179, 179, npl)
        plat = rng.uniform(-85, 85, npl)
        got = _run(qlon, qlat, plon, plat, radius, metric, level)
        exp = _pairs_brute(
            qlon, qlat, np.arange(nq), plon, plat, np.arange(npl), radius, metric
        )
        assert got == exp and len(exp) > 0

    def test_antimeridian_pairs_found(self, ray_session):
        # point on one side of the dateline, place on the other — the
        # haversine metric wraps, and the disk cover must too
        qlon = np.array([179.8, -179.9, 0.0])
        qlat = np.array([10.0, -20.0, 0.0])
        plon = np.array([-179.9, 179.95, 150.0])
        plat = np.array([10.05, -20.01, 0.0])
        got = _run(qlon, qlat, plon, plat, 100_000.0, "haversine", 6)
        assert (0, 0) in got and (1, 1) in got and (2, 2) not in got

    def test_polar_place_full_ring(self, ray_session):
        # a place at lat 89.9: its radius disk spans every longitude,
        # so a point at any lon within the lat band must pair
        qlon = np.array([-135.0, 45.0])
        qlat = np.array([89.85, 89.8])
        plon = np.array([10.0])
        plat = np.array([89.9])
        got = _run(qlon, qlat, plon, plat, 60_000.0, "haversine", 6)
        exp = _pairs_brute(
            qlon, qlat, np.arange(2), plon, plat, np.arange(1), 60_000.0, "haversine"
        )
        assert got == exp and (0, 0) in got

    def test_disk_bbox_is_conservative(self):
        # every point within radius of the place lies inside the bbox
        rng = np.random.RandomState(3)
        lon = rng.uniform(-179, 179, 50)
        lat = rng.uniform(-88, 88, 50)
        r = 400_000.0
        minx, miny, maxx, maxy = rj.disk_bboxes(lon, lat, r, "haversine")
        # sample the disk boundary via bearings
        for i in range(len(lon)):
            for brg in np.linspace(0, 2 * np.pi, 24, endpoint=False):
                # forward-project ~r along bearing (sphere, small-angle)
                dlat = np.degrees(r / 6_371_008.8) * np.cos(brg)
                plat_ = lat[i] + dlat
                coslat = max(np.cos(np.radians(plat_)), 1e-9)
                dlon = np.degrees(r / 6_371_008.8) * np.sin(brg) / coslat
                plon_ = lon[i] + dlon
                if haversine_m(lon[i], lat[i], plon_, plat_) > r:
                    continue  # projection overshoots near poles — not in-disk
                assert miny[i] <= plat_ <= maxy[i]
                lo, hi = minx[i], maxx[i]
                w = ((plon_ + 180.0) % 360.0) - 180.0
                if lo <= hi:
                    assert lo <= w <= hi
                else:  # wrap box
                    assert w >= lo or w <= hi


class TestOracleMargin:
    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_haversine_gate_margin(self, sf):
        """No (point, place) distance sits within libm-noise of the
        250 km gate threshold — the slack that makes the SQL oracle's
        sin/cos (different libm than numpy) agree pair-for-pair."""
        import pyarrow.parquet as pq

        ev = pq.read_table(f"/root/testdata/{sf}/events.parquet", columns=["event_id"])
        cu = pq.read_table(f"/root/testdata/{sf}/customer.parquet", columns=["c_custkey"])
        eid = ev.column("event_id").to_numpy().astype(np.int64)
        ck = cu.column("c_custkey").to_numpy().astype(np.int64)
        qlon = ((eid * 48271) % 36000) / 100.0 - 180.0 + 0.005
        qlat = ((eid * 16807) % 18000) / 100.0 - 90.0 + 0.005
        plon = ((ck * 69621) % 36000) / 100.0 - 180.0 + 0.0075
        plat = ((ck * 40692) % 18000) / 100.0 - 90.0 + 0.0075
        # chunk the query side to bound the distance-matrix footprint
        min_gap = np.inf
        for s in range(0, len(eid), 2000):
            d = haversine_m(
                qlon[s : s + 2000, None],
                qlat[s : s + 2000, None],
                plon[None, :],
                plat[None, :],
            )
            min_gap = min(min_gap, float(np.abs(d - rj.HAVERSINE_RADIUS_M).min()))
        assert min_gap > 1.0, f"pair within {min_gap} m of threshold"
