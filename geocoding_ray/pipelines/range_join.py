"""Spatial range join: all (point, place) pairs within a radius.

The distance-θ-join the reference's providers imply but never batch:
GeoAdmin ``identify`` returns features within ``tolerance`` of ONE point
per HTTP call (/root/reference/src/geoadmin.rs:260-306); at 10^12 rows
the same semantics is a distributed co-shuffle join.

Physical plan (the reverse_shuffle pattern with a disk cover)::

    places ──disk bbox──> cover cells at CELL_LEVEL   [replicated]
    points ──encode─────> exactly one cell per point
    union ──groupby(cell)──> map_groups(pairwise metric, d <= r)

Correctness: a place's disk-cover contains every cell whose interior
can hold a point within ``radius`` of it, and each (place, cell) pair
is emitted once (``bbox_cover_rows``), so every qualifying pair is
tested in exactly one group — no dedup pass needed.

Scale notes:

* replication factor = disk-cover size; pick ``cell_level`` so the cell
  edge is about the disk diameter (O(4-9) cells/place).  Near-pole
  places degrade to a full longitude ring — correct, rare, bounded by
  2^level;
* group cost is |points-in-cell| x |places-covering-cell| vectorized
  float64 — the classic grid-join bound, tunable by level;
* both sides stream; nothing is broadcast or driver-resident.

Metrics:

* ``planar``  — squared-degree distance, bit-reproducible against a SQL
  oracle (state/distance.planar_sq_deg discipline);
* ``haversine`` — great-circle meters (state/distance.haversine_m).
  sin/cos are not IEEE-exactly-rounded, so SQL parity additionally
  needs a boundary margin (asserted in tests/test_range_join.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.distance import EARTH_RADIUS_M, haversine_m, planar_sq_deg
from .reverse_shuffle import bbox_cover_rows


def disk_bboxes(
    lon: np.ndarray, lat: np.ndarray, radius: float, metric: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-place bounding box of the radius disk.

    haversine: constant lat half-height; lon half-width widened by the
    tightest cos(lat) anywhere in the disk's lat band (so the bbox is
    conservative at every latitude it spans).  A box spilling past the
    antimeridian comes back with ``minx > maxx`` — the wrap convention
    ``bbox_cover_rows`` expands correctly.

    planar: the metric is raw lon-lat degrees with NO wrap, so the box
    is clamped to [-180, 180] instead of wrapped.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if metric == "planar":
        r = float(radius)
        return (
            np.maximum(lon - r, -180.0),
            np.maximum(lat - r, -90.0),
            np.minimum(lon + r, 180.0),
            np.minimum(lat + r, 90.0),
        )
    dlat = np.degrees(radius / EARTH_RADIUS_M)
    band = np.minimum(np.abs(lat) + dlat, 90.0)
    coslat = np.cos(np.radians(band))
    with np.errstate(divide="ignore"):
        dlon = np.degrees(radius / (EARTH_RADIUS_M * coslat))
    dlon = np.where(coslat <= 1e-12, 360.0, dlon)
    miny = np.maximum(lat - dlat, -90.0)
    maxy = np.minimum(lat + dlat, 90.0)
    full = dlon >= 180.0
    minx = np.where(full, -180.0, lon - dlon)
    maxx = np.where(full, 180.0, lon + dlon)
    # wrap into [-180, 180); minx > maxx then signals the split cover
    minx = np.where(minx < -180.0, minx + 360.0, minx)
    maxx = np.where(maxx > 180.0, maxx - 360.0, maxx)
    return minx, miny, maxx, maxy


def explode_place_cells(
    batch: pa.Table, cell_level: int, radius: float, metric: str, place_id: str
) -> pa.Table:
    """Place rows -> one row per disk-cover cell (vectorized)."""
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    row_idx, cell = bbox_cover_rows(*disk_bboxes(lon, lat, radius, metric), cell_level)
    out = batch.select([place_id, "lon", "lat"]).take(pa.array(row_idx, type=pa.int64()))
    return out.append_column("cell", pa.array(cell.view(np.int64), type=pa.int64()))


def make_pair_matcher(radius: float, metric: str, point_id: str, place_id: str):
    """Per-cell group: vectorized pairwise distance, keep d <= radius."""

    def match(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        qmask = pc.equal(g.column("side"), "q")
        qs = g.filter(qmask)
        ps = g.filter(pc.invert(qmask))
        empty = pa.table(
            {
                point_id: pa.array([], type=pa.int64()),
                place_id: pa.array([], type=pa.int64()),
            }
        )
        if qs.num_rows == 0 or ps.num_rows == 0:
            return empty
        qlon = qs.column("lon").to_numpy(zero_copy_only=False)
        qlat = qs.column("lat").to_numpy(zero_copy_only=False)
        plon = ps.column("plon").to_numpy(zero_copy_only=False)
        plat = ps.column("plat").to_numpy(zero_copy_only=False)
        if metric == "planar":
            d = planar_sq_deg(qlon[:, None], qlat[:, None], plon[None, :], plat[None, :])
            keep = d <= radius * radius
        else:
            d = haversine_m(qlon[:, None], qlat[:, None], plon[None, :], plat[None, :])
            keep = d <= radius
        qi, pi = np.nonzero(keep)
        if len(qi) == 0:
            return empty
        qid = qs.column(point_id).to_numpy(zero_copy_only=False).astype(np.int64)
        pid = ps.column(place_id).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                point_id: pa.array(qid[qi], type=pa.int64()),
                place_id: pa.array(pid[pi], type=pa.int64()),
            }
        )

    return match


def run_range_join(
    points_ds,
    places_ds,
    radius: float,
    cell_level: int = 6,
    point_id: str = "event_id",
    place_id: str = "place_id",
    metric: str = "haversine",
):
    """Distributed radius join.  ``points_ds``: (point_id, lon, lat);
    ``places_ds``: (place_id, lon, lat).  Returns (point_id, place_id)
    pairs with distance <= radius (meters for haversine, degrees for
    planar)."""
    if metric not in ("haversine", "planar"):
        raise ValueError(f"unknown metric {metric!r}")

    from .reverse_shuffle import key_points

    def tag_places(b: pa.Table) -> pa.Table:
        b = explode_place_cells(b, cell_level, radius, metric, place_id)
        # place lon/lat ride under distinct names so the union schema
        # keeps the point side's lon/lat null-free
        b = b.append_column("plon", b.column("lon")).append_column("plat", b.column("lat"))
        b = b.drop_columns(["lon", "lat"])
        b = b.append_column("side", pa.array(["g"] * b.num_rows, type=pa.string()))
        b = b.append_column("lon", pa.nulls(b.num_rows, type=pa.float64()))
        b = b.append_column("lat", pa.nulls(b.num_rows, type=pa.float64()))
        return b.append_column(point_id, pa.nulls(b.num_rows, type=pa.int64()))

    def tag_points(b: pa.Table) -> pa.Table:
        b = key_points(b, cell_level, point_id)
        b = b.append_column("side", pa.array(["q"] * b.num_rows, type=pa.string()))
        b = b.append_column("plon", pa.nulls(b.num_rows, type=pa.float64()))
        b = b.append_column("plat", pa.nulls(b.num_rows, type=pa.float64()))
        return b.append_column(place_id, pa.nulls(b.num_rows, type=pa.int64()))

    cols = ["cell", "side", point_id, place_id, "lon", "lat", "plon", "plat"]
    g_side = places_ds.map_batches(tag_places, batch_format="pyarrow").select_columns(cols)
    q_side = points_ds.map_batches(tag_points, batch_format="pyarrow").select_columns(cols)
    both = g_side.union(q_side)
    return both.groupby("cell").map_groups(
        make_pair_matcher(radius, metric, point_id, place_id), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Gated queries: deterministic synthetic points (events) vs places
# (customer), same closed-form lattices the SQL oracle reproduces.
# ---------------------------------------------------------------------------

PLANAR_RADIUS_DEG = 2.5
HAVERSINE_RADIUS_M = 250_000.0


def _synth_place_points(batch: pa.Table) -> pa.Table:
    """customer -> (place_id, lon, lat); decorrelated from the event
    lattice (different multipliers + 0.0075 offset) so pair distances
    are spread instead of degenerate."""
    ck = batch.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    lon = ((ck * 69621) % 36000) / 100.0 - 180.0 + 0.0075
    lat = ((ck * 40692) % 18000) / 100.0 - 90.0 + 0.0075
    return pa.table(
        {
            "place_id": pa.array(ck, type=pa.int64()),
            "lon": pa.array(lon, type=pa.float64()),
            "lat": pa.array(lat, type=pa.float64()),
        }
    )


def _sides(sf_dir: str):
    import ray.data as rd

    from .oracle_queries import _synth_pip_points

    pts = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"]).map_batches(
        _synth_pip_points, batch_format="pyarrow"
    )
    pls = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]).map_batches(
        _synth_place_points, batch_format="pyarrow"
    )
    return pts, pls


def q_range_join(sf_dir: str):
    """Planar-degree radius join — bit-reproducible vs the SQL oracle
    (same subtract/multiply/add expression order both sides)."""
    pts, pls = _sides(sf_dir)
    return run_range_join(pts, pls, radius=PLANAR_RADIUS_DEG, cell_level=6, metric="planar")


def q_range_join_km(sf_dir: str):
    """Haversine radius join (meters); SQL parity holds because no pair
    distance sits within libm-noise of the threshold (margin asserted
    in tests/test_range_join.py)."""
    pts, pls = _sides(sf_dir)
    return run_range_join(pts, pls, radius=HAVERSINE_RADIUS_M, cell_level=6, metric="haversine")


_SQL_SIDES = """
pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
pls AS (
  SELECT c_custkey AS place_id,
         ((c_custkey * 69621) % 36000) / 100.0 - 180.0 + 0.0075 AS lon,
         ((c_custkey * 40692) % 18000) / 100.0 - 90.0 + 0.0075 AS lat
  FROM customer)
"""

SQL_RANGE_JOIN = f"""
WITH {_SQL_SIDES}
SELECT p.event_id, g.place_id
FROM pts p JOIN pls g
  ON (p.lon - g.lon) * (p.lon - g.lon) + (p.lat - g.lat) * (p.lat - g.lat)
     <= {PLANAR_RADIUS_DEG} * {PLANAR_RADIUS_DEG}
"""

# mirrors state/distance.haversine_m term by term (dlat/dlon as
# radians(a) - radians(b), squares as products, clip via least)
SQL_RANGE_JOIN_KM = f"""
WITH {_SQL_SIDES}
SELECT p.event_id, g.place_id
FROM pts p JOIN pls g
  ON 2.0 * 6371008.8 * asin(sqrt(least(
       sin((radians(g.lat) - radians(p.lat)) * 0.5)
         * sin((radians(g.lat) - radians(p.lat)) * 0.5)
     + cos(radians(p.lat)) * cos(radians(g.lat))
         * sin((radians(g.lon) - radians(p.lon)) * 0.5)
         * sin((radians(g.lon) - radians(p.lon)) * 0.5),
     1.0))) <= {HAVERSINE_RADIUS_M}
"""
