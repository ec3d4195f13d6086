"""Geospatial analytics operators over the deterministic synthetic
point field (the shared ``_pip_lonlat`` formula): grid-cell hotspot
detection via k-ring neighbor smoothing.

Everything here follows the repo's bit-reproducibility discipline: the
only float ops are the lon/lat synthesis and one floor-quantization to
grid coordinates, both IEEE-exact and reproduced verbatim in the
DuckDB oracles; every aggregate is integer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .oracle_queries import _pip_lonlat

# ---------------------------------------------------------------------------
# spatial hotspots: per-cell counts + 3x3 k-ring smoothing
# ---------------------------------------------------------------------------
#
# The Getis-Ord-flavored density report every geo dashboard runs: count
# points per grid cell at HOTSPOT_LEVEL, sum each cell's 3x3
# neighborhood (lon wraps around the antimeridian, lat clamps at the
# poles — neighbors outside [0, n-1] in y simply don't exist), and flag
# cells whose own count beats 2/9 of the ring total (integer cross-
# multiplied, no division).
#
# Distributed shape: per-batch partial counts (np.unique over packed
# cell keys) -> native groupby sum = one shuffle of cell-cardinality
# rows (<= 4^level regardless of input size); each distinct cell then
# emits its 9 ring memberships (a 9x fan-out of CELL rows, not point
# rows) -> second cell-keyed groupby -> a cells x cells Dataset.join.
# At 100 TB the point stream never reaches the join: everything after
# the first groupby is bounded by the grid, not the data.


HOTSPOT_LEVEL = 6  # 64 x 64 grid
_N = 1 << HOTSPOT_LEVEL


def _grid_xy(event_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon, lat = _pip_lonlat(event_id)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * _N).astype(np.int64), 0, _N - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * _N).astype(np.int64), 0, _N - 1)
    return x, y


def _hotspot_partials(batch: pa.Table) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    x, y = _grid_xy(eid)
    key, cnt = np.unique(x * _N + y, return_counts=True)
    return pa.table(
        {
            "x": pa.array(key // _N, type=pa.int64()),
            "y": pa.array(key % _N, type=pa.int64()),
            "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
        }
    )


def _ring_emit(batch: pa.Table) -> pa.Table:
    """Each (x, y, n) cell row contributes its count to the 9 ring
    positions it is a neighbor of (x wraps, y clamps)."""
    x = batch.column("x").to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False)
    n = batch.column("n").to_numpy(zero_copy_only=False)
    dx, dy = np.meshgrid(np.arange(-1, 2), np.arange(-1, 2))
    dx, dy = dx.ravel(), dy.ravel()
    rx = (x[:, None] + dx[None, :] + _N) % _N
    ry = y[:, None] + dy[None, :]
    nn = np.broadcast_to(n[:, None], rx.shape)
    keep = (ry >= 0) & (ry < _N)
    return pa.table(
        {
            "x": pa.array(rx[keep], type=pa.int64()),
            "y": pa.array(ry[keep], type=pa.int64()),
            "ring_n": pa.array(nn[keep], type=pa.int64()),
        }
    )


def q_spatial_hotspots(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .olap_queries import _scrub_empties

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    counts = (
        ds.map_batches(_hotspot_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum(on="n", alias_name="n"))
    )
    rings = (
        counts.map_batches(_ring_emit, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum(on="ring_n", alias_name="ring_n"))
    )
    # both sides are grid-bounded; scrub sort-groupby empties pre-join
    joined = _scrub_empties(counts).join(
        _scrub_empties(rings), join_type="inner", on=("x", "y"), num_partitions=4
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        r = batch.column("ring_n").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "x": batch.column("x"),
                "y": batch.column("y"),
                "n": batch.column("n"),
                "ring_n": batch.column("ring_n"),
                "is_hotspot": pa.array(9 * n > 2 * r),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


SQL_SPATIAL_HOTSPOTS = f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_N}) AS BIGINT), 0), {_N - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {_N}) AS BIGINT), 0), {_N - 1}) AS y
  FROM pts),
counts AS (SELECT x, y, COUNT(*) AS n FROM xy GROUP BY x, y),
offs AS (SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)),
rings AS (
  SELECT ((c.x + o.dx + {_N}) % {_N}) AS x, c.y + o.dy AS y,
         CAST(SUM(c.n) AS BIGINT) AS ring_n
  FROM counts c, offs o
  WHERE c.y + o.dy BETWEEN 0 AND {_N - 1}
  GROUP BY 1, 2)
SELECT c.x, c.y, c.n, r.ring_n, 9 * c.n > 2 * r.ring_n AS is_hotspot
FROM counts c JOIN rings r USING (x, y)
"""


# ---------------------------------------------------------------------------
# kNN join: both sides large, ring-bounded, one cell-keyed co-shuffle
# ---------------------------------------------------------------------------
#
# The spatial-join sibling of reverse_knn (stages/reverse.py) for the
# case where NEITHER side fits in a broadcast index: every query point
# gets its KNN_K nearest database points among those lying in the
# query's 3x3 cell ring at KNN_LEVEL (lon wraps, lat clamps).  Ring-
# bounded kNN is the standard distributed formulation (a radius-bounded
# join): exactness holds within the declared window and the oracle
# reproduces exactly that window, so the operator is value-hash gated
# end to end — including the float64 squared planar distance, which
# both engines compute with the identical (dx*dx + dy*dy) op order.
#
# Distributed shape: db rows are replicated to the 9 ring cells they
# can serve (a bounded 9x fan-out of the db stream — never a
# broadcast), queries are keyed by their own cell, and ONE
# groupby(cell).map_groups computes each cell's dense nq x nd distance
# matrix vectorized.  At 100 TB both sides stream through the same
# single hash shuffle; per-group work is bounded by grid occupancy
# (pick KNN_LEVEL so cell population ~ thousands), and hot cells can be
# salted on the query side since db replication is cell-deterministic.

KNN_LEVEL = 6
_KN = 1 << KNN_LEVEL
KNN_K = 3
KNN_Q_MOD = 23  # event_id % 23 == 0 -> query side, else db side


def _knn_sides(batch: pa.Table) -> pa.Table:
    """events batch -> tagged, cell-keyed rows: queries once at their
    own cell (side 0), db points replicated to their 3x3 ring (side 1,
    pre-sorted by id inside the batch so group-side stable argsort
    tie-breaks on id for free)."""
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    lon, lat = _pip_lonlat(eid)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * _KN).astype(np.int64), 0, _KN - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * _KN).astype(np.int64), 0, _KN - 1)
    isq = (eid % KNN_Q_MOD) == 0

    q_cell = x[isq] * _KN + y[isq]
    dm = ~isq
    dx, dy = np.meshgrid(np.arange(-1, 2), np.arange(-1, 2))
    dx, dy = dx.ravel(), dy.ravel()
    rx = (x[dm][:, None] + dx[None, :] + _KN) % _KN
    ry = y[dm][:, None] + dy[None, :]
    keep = (ry >= 0) & (ry < _KN)
    d_cell = (rx * _KN + ry)[keep]
    d_rep = np.broadcast_to(np.arange(dm.sum())[:, None], keep.shape)[keep]

    cell = np.concatenate([q_cell, d_cell])
    side = np.concatenate(
        [np.zeros(len(q_cell), dtype=np.int8), np.ones(len(d_cell), dtype=np.int8)]
    )
    ids = np.concatenate([eid[isq], eid[dm][d_rep]])
    lons = np.concatenate([lon[isq], lon[dm][d_rep]])
    lats = np.concatenate([lat[isq], lat[dm][d_rep]])
    return pa.table(
        {
            "cell": pa.array(cell, type=pa.int64()),
            "side": pa.array(side, type=pa.int8()),
            "id": pa.array(ids, type=pa.int64()),
            "lon": pa.array(lons, type=pa.float64()),
            "lat": pa.array(lats, type=pa.float64()),
        }
    )


def _knn_group(group: pa.Table) -> pa.Table:
    side = group.column("side").to_numpy(zero_copy_only=False)
    ids = group.column("id").to_numpy(zero_copy_only=False)
    lon = group.column("lon").to_numpy(zero_copy_only=False)
    lat = group.column("lat").to_numpy(zero_copy_only=False)
    q = side == 0
    d = ~q
    empty = pa.table(
        {
            "qid": pa.array([], type=pa.int64()),
            "nid": pa.array([], type=pa.int64()),
            "d2": pa.array([], type=pa.float64()),
            "rk": pa.array([], type=pa.int64()),
        }
    )
    if not q.any() or not d.any():
        return empty
    qid, qlon, qlat = ids[q], lon[q], lat[q]
    order = np.argsort(ids[d], kind="stable")
    nid, dlon, dlat = ids[d][order], lon[d][order], lat[d][order]
    dl = qlon[:, None] - dlon[None, :]
    dp = qlat[:, None] - dlat[None, :]
    d2 = dl * dl + dp * dp
    k = min(KNN_K, len(nid))
    # columns are in ascending nid order, so ONE stable argsort breaks
    # d2 ties by ascending nid exactly like the oracle's ORDER BY d2,
    # nid.  (argpartition pruning would be faster but mis-keeps ties
    # that straddle the k boundary; the scale knob is KNN_LEVEL, which
    # bounds per-cell population, not the per-row sort.)
    srt = np.argsort(d2, axis=1, kind="stable")[:, :k]
    d2s = np.take_along_axis(d2, srt, axis=1)
    nids = nid[srt]
    return pa.table(
        {
            "qid": pa.array(np.repeat(qid, k), type=pa.int64()),
            "nid": pa.array(nids.ravel(), type=pa.int64()),
            "d2": pa.array(d2s.ravel(), type=pa.float64()),
            "rk": pa.array(np.tile(np.arange(1, k + 1), len(qid)), type=pa.int64()),
        }
    )


def q_knn_join(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return (
        ds.map_batches(_knn_sides, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(_knn_group, batch_format="pyarrow")
    )


SQL_KNN_JOIN = f"""
WITH pts AS (
  SELECT event_id AS id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT id, lon, lat,
         least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_KN}) AS BIGINT), 0), {_KN - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {_KN}) AS BIGINT), 0), {_KN - 1}) AS y
  FROM pts),
q AS (SELECT * FROM xy WHERE id % {KNN_Q_MOD} = 0),
d AS (SELECT * FROM xy WHERE id % {KNN_Q_MOD} <> 0),
ranked AS (
  SELECT q.id AS qid, d.id AS nid,
         (q.lon - d.lon) * (q.lon - d.lon) + (q.lat - d.lat) * (q.lat - d.lat) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY q.id
           ORDER BY (q.lon - d.lon) * (q.lon - d.lon) + (q.lat - d.lat) * (q.lat - d.lat),
                    d.id) AS rk
  FROM q JOIN d
    ON ((d.x - q.x + {_KN}) % {_KN}) IN (0, 1, {_KN - 1})
   AND d.y BETWEEN q.y - 1 AND q.y + 1)
SELECT qid, nid, d2, rk FROM ranked WHERE rk <= {KNN_K}
"""


# ---------------------------------------------------------------------------
# tile pyramid: multi-zoom rollup, log-many grid-bounded shuffles
# ---------------------------------------------------------------------------
#
# The tiling engine's core aggregate (north rule: "spatial-join +
# tiling engine"): per-tile point counts at every zoom level 0..PYR_Z,
# web-map-style (z, x, y) addressing.  One pass over the point stream
# produces finest-level partials; every coarser level is derived from
# the previous one by (x >> 1, y >> 1) halving — so after the first
# grid-bounded groupby NOTHING is proportional to the input: PYR_Z more
# shuffles of <= 4^z rows each.  The finest level is materialized (it
# is the working set, <= 4^PYR_Z rows) so the lazy lineage does not
# re-scan the points per level.

PYR_Z = 6  # finest level; output levels 0..PYR_Z


def _pyr_partials(batch: pa.Table) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    lon, lat = _pip_lonlat(eid)
    m = 1 << PYR_Z
    x = np.clip(np.floor((lon + 180.0) / 360.0 * m).astype(np.int64), 0, m - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * m).astype(np.int64), 0, m - 1)
    key, cnt = np.unique(x * m + y, return_counts=True)
    return pa.table(
        {
            "x": pa.array(key // m, type=pa.int64()),
            "y": pa.array(key % m, type=pa.int64()),
            "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
        }
    )


def q_tile_pyramid(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    level = (
        ds.map_batches(_pyr_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum(on="n", alias_name="n"))
        .materialize()  # <= 4^PYR_Z rows: the pyramid working set
    )

    def stamp(z):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "z", pa.array(np.full(batch.num_rows, z, dtype=np.int64))
            ).select(["z", "x", "y", "n"])

        return fn

    out = level.map_batches(stamp(PYR_Z), batch_format="pyarrow")
    for z in range(PYR_Z - 1, -1, -1):

        def halve(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "x": pc.shift_right(batch.column("x"), 1),
                    "y": pc.shift_right(batch.column("y"), 1),
                    "n": batch.column("n"),
                }
            )

        level = (
            level.map_batches(halve, batch_format="pyarrow")
            .groupby(["x", "y"])
            .aggregate(Sum(on="n", alias_name="n"))
            .materialize()
        )
        out = out.union(level.map_batches(stamp(z), batch_format="pyarrow"))
    return out


def _sql_tile_pyramid() -> str:
    m = 1 << PYR_Z
    levels = "\nUNION ALL\n".join(
        f"SELECT {z} AS z, x // {1 << (PYR_Z - z)} AS x, y // {1 << (PYR_Z - z)} AS y,"
        f" COUNT(*) AS n FROM xy GROUP BY 2, 3"
        if z < PYR_Z
        else f"SELECT {z} AS z, x, y, COUNT(*) AS n FROM xy GROUP BY 2, 3"
        for z in range(PYR_Z, -1, -1)
    )
    return f"""
WITH pts AS (
  SELECT ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {m}) AS BIGINT), 0), {m - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {m}) AS BIGINT), 0), {m - 1}) AS y
  FROM pts)
{levels}
"""


SQL_TILE_PYRAMID = _sql_tile_pyramid()


# ---------------------------------------------------------------------------
# trajectory length: per-user planar path length, scaled-int segments
# ---------------------------------------------------------------------------
#
# Each user's events, ordered by (ts, event_id), trace a polyline over
# the synthetic point field; the operator reports the number of points
# and the total path length.  Segment lengths are planar
# sqrt(dlon^2 + dlat^2) floored to micro-degree ints BEFORE summing, so
# the aggregate is order-free and bit-exact across any partitioning
# (float sums are order-dependent; scaled-int sums are not — the same
# discipline as the repo's cents-based money aggregates).  sqrt, *, and
# floor are all correctly-rounded IEEE ops, so numpy and DuckDB agree
# per segment.
#
# Distributed shape: ONE user-keyed hash shuffle, then per-group
# vectorized sort + diff.  The partitioning assumption (documented, as
# SURVEY.md §2 requires for custom operators): per-user event counts
# are bounded (thousands), user cardinality scales with the data — the
# same assumption sessionization states.  For unbounded single-key
# streams the sessionize sort + boundary-repair plan is the fallback.

TRAJ_SCALE = 1_000_000.0


def _traj_group(group: pa.Table) -> pa.Table:
    uid = group.column("user_id").to_numpy(zero_copy_only=False)
    ts = group.column("ts").to_numpy(zero_copy_only=False).view(np.int64)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts))
    lon, lat = _pip_lonlat(eid[order])
    if len(lon) > 1:
        dl = lon[1:] - lon[:-1]
        dp = lat[1:] - lat[:-1]
        seg = np.floor(np.sqrt(dl * dl + dp * dp) * TRAJ_SCALE).astype(np.int64)
        path = int(seg.sum())
    else:
        path = 0
    return pa.table(
        {
            "user_id": pa.array([uid[0]], type=pa.int64()),
            "n_pts": pa.array([len(uid)], type=pa.int64()),
            "path_int": pa.array([path], type=pa.int64()),
        }
    )


def q_trajectory_len(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    return ds.groupby("user_id").map_groups(_traj_group, batch_format="pyarrow")


SQL_TRAJECTORY_LEN = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
seg AS (
  SELECT user_id,
         CAST(floor(sqrt((lon - LAG(lon) OVER w) * (lon - LAG(lon) OVER w)
                       + (lat - LAG(lat) OVER w) * (lat - LAG(lat) OVER w))
                    * {TRAJ_SCALE}) AS BIGINT) AS d
  FROM pts
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, COUNT(*) AS n_pts,
       CAST(COALESCE(SUM(d), 0) AS BIGINT) AS path_int
FROM seg GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# geo extent: per-user activity bounding box (ST_Extent analogue)
# ---------------------------------------------------------------------------
#
# Min/max are order-free even over floats, so this is pure native
# partial aggregation: per-batch combine inside Ray's groupby, one slim
# shuffle of per-(batch, user) partials — the cheapest possible shape
# for a 100-TB extent scan.

def _extent_pts(batch: pa.Table) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    lon, lat = _pip_lonlat(eid)
    return pa.table(
        {
            "user_id": batch.column("user_id"),
            "lon": pa.array(lon, type=pa.float64()),
            "lat": pa.array(lat, type=pa.float64()),
        }
    )


def q_geo_extent(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])
    return (
        ds.map_batches(_extent_pts, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Min(on="lon", alias_name="min_lon"),
            Max(on="lon", alias_name="max_lon"),
            Min(on="lat", alias_name="min_lat"),
            Max(on="lat", alias_name="max_lat"),
            Count(alias_name="n"),
        )
    )


SQL_GEO_EXTENT = """
WITH pts AS (
  SELECT user_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events)
SELECT user_id, MIN(lon) AS min_lon, MAX(lon) AS max_lon,
       MIN(lat) AS min_lat, MAX(lat) AS max_lat, COUNT(*) AS n
FROM pts GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Morton range scan: two-phase spatial index scan (prune + refine)
# ---------------------------------------------------------------------------
#
# The read-side story of the cell index (state/cells.py): an
# axis-aligned bbox is compiled ONCE into sorted contiguous Morton key
# ranges at MRS_LEVEL (grid-bounded: <= 4^level keys, driver-tiny, the
# same object a Lance/parquet reader would push down as key-range
# predicates), every batch then does a two-sided searchsorted against
# the range table — points outside any range never leave the scan — and
# survivors get the exact bbox refine.  The refine makes the result
# independent of MRS_LEVEL, which the determinism test exercises; the
# oracle is the plain bbox filter the index scan must equal.

MRS_LEVEL = 7
MRS_BBOX = (-10.0, 35.0, 30.0, 60.0)  # minx, miny, maxx, maxy ("Europe")


def _morton_ranges(bbox, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (starts, ends) inclusive Morton-key ranges covering bbox."""
    from ..state.cells import cell_from_xy, lonlat_to_xy

    minx, miny, maxx, maxy = bbox
    x0, y0 = lonlat_to_xy(np.array([minx]), np.array([miny]), level)
    x1, y1 = lonlat_to_xy(np.array([maxx]), np.array([maxy]), level)
    xs = np.arange(x0[0], x1[0] + 1, dtype=np.int64)
    ys = np.arange(y0[0], y1[0] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    keys = np.sort(cell_from_xy(gx.ravel(), gy.ravel(), level).astype(np.uint64))
    cut = np.nonzero(np.diff(keys) != np.uint64(1))[0]
    starts = keys[np.concatenate([[0], cut + 1])]
    ends = keys[np.concatenate([cut, [len(keys) - 1]])]
    return starts, ends


def q_morton_range_scan(sf_dir: str):
    import ray
    import ray.data as rd

    from ..state.cells import encode

    starts, ends = _morton_ranges(MRS_BBOX, MRS_LEVEL)
    ranges_ref = ray.put((starts, ends))
    minx, miny, maxx, maxy = MRS_BBOX

    def scan(batch: pa.Table) -> pa.Table:
        st, en = ray.get(ranges_ref)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = _pip_lonlat(eid)
        key = encode(lon, lat, MRS_LEVEL).astype(np.uint64)
        pos = np.searchsorted(st, key, side="right") - 1
        cand = (pos >= 0) & (key <= en[np.clip(pos, 0, None)])
        # exact refine: half-open [min, max) on both axes
        hit = cand & (lon >= minx) & (lon < maxx) & (lat >= miny) & (lat < maxy)
        return pa.table(
            {
                "event_id": pa.array(eid[hit], type=pa.int64()),
                "lon": pa.array(lon[hit], type=pa.float64()),
                "lat": pa.array(lat[hit], type=pa.float64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(scan, batch_format="pyarrow")


SQL_MORTON_RANGE_SCAN = f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events)
SELECT event_id, lon, lat FROM pts
WHERE lon >= {MRS_BBOX[0]} AND lon < {MRS_BBOX[2]}
  AND lat >= {MRS_BBOX[1]} AND lat < {MRS_BBOX[3]}
"""


# ---------------------------------------------------------------------------
# ring area: per-user shoelace polygon area + orientation (ST_Area shape)
# ---------------------------------------------------------------------------
#
# The vector-geometry aggregate (ST_Area / ST_IsCCW over a vertex
# stream): each user's events form a closed ring in (ts, event_id)
# order with deterministic integer vertices, and the signed doubled
# area is the cyclic shoelace sum S = sum(x_i*y_{i+1} - x_{i+1}*y_i).
# All arithmetic is exact int64 (coords < 1000, per-term < 1e6), so the
# result is bit-reproducible and order-of-merge-free once the ring
# order is fixed.
#
# Distributed shape: one user-keyed shuffle; the per-group work is a
# single lexsort + one vectorized roll/multiply pass, and the group
# bound is max-vertices-per-ring (a geometry invariant — real polygon
# rings are bounded), not stream size.  Degenerate rings (n <= 2)
# yield S = 0 on both sides by the same cyclic formula.

RING_XM = 37
RING_YM = 101
RING_MOD = 1000


def q_ring_area(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def shoelace(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        e = eid[order]
        x = (e * RING_XM) % RING_MOD
        y = (e * RING_YM) % RING_MOD
        xn, yn = np.roll(x, -1), np.roll(y, -1)
        s2 = int((x * yn - xn * y).sum())
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "n_vertices": pa.array([len(e)], type=pa.int64()),
                "s2": pa.array([s2], type=pa.int64()),
                "area2_abs": pa.array([abs(s2)], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(shoelace, batch_format="pyarrow")


SQL_RING_AREA = f"""
WITH v AS (
  SELECT user_id, ts, event_id,
         (event_id * {RING_XM}) % {RING_MOD} AS x,
         (event_id * {RING_YM}) % {RING_MOD} AS y
  FROM events),
p AS (
  SELECT user_id, x, y,
         COALESCE(LEAD(x) OVER w, FIRST_VALUE(x) OVER w) AS xn,
         COALESCE(LEAD(y) OVER w, FIRST_VALUE(y) OVER w) AS yn
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(x * yn - xn * y) AS BIGINT) AS s2,
       CAST(ABS(SUM(x * yn - xn * y)) AS BIGINT) AS area2_abs
FROM p GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# geohash encode: base-32 cell string (the third cell-id dialect)
# ---------------------------------------------------------------------------
#
# cell_assign covers Morton/quadkey; this adds the geohash dialect every
# geo data-exchange pipeline needs: 15+15 bit quantization, LON-first
# bit interleave (MSB lon — geohash's defining difference from Morton's
# y-first order), and the base-32 alphabet render (i, l, o omitted).
# Pure vectorized integer ops after the one IEEE-exact quantization,
# reproduced bit-for-bit in the DuckDB oracle (30 shifted-bit terms +
# substr alphabet lookup), so both the integer code AND the rendered
# string are value-hash gated.

GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_BITS = 15  # per axis; 30 bits = 6 base-32 chars


def q_geohash(sf_dir: str):
    import ray.data as rd

    from .oracle_queries import _pip_lonlat

    alpha = np.array(list(GEOHASH_ALPHABET))

    def encode(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        lon, lat = _pip_lonlat(eid)
        scale = float(1 << GEOHASH_BITS)
        glon = np.clip(
            np.floor((lon + 180.0) / 360.0 * scale), 0, scale - 1
        ).astype(np.int64)
        glat = np.clip(
            np.floor((lat + 90.0) / 180.0 * scale), 0, scale - 1
        ).astype(np.int64)
        code = np.zeros(len(eid), dtype=np.int64)
        for i in range(GEOHASH_BITS):
            code |= ((glon >> i) & 1) << (2 * i + 1)
            code |= ((glat >> i) & 1) << (2 * i)
        gh = alpha[(code >> 25) & 31]
        for s in (20, 15, 10, 5, 0):
            gh = np.char.add(gh, alpha[(code >> s) & 31])
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "gh_code": pa.array(code, type=pa.int64()),
                "geohash6": pa.array(gh.tolist(), type=pa.string()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    return ds.map_batches(encode, batch_format="pyarrow")


def _sql_geohash() -> str:
    terms = []
    for i in range(GEOHASH_BITS):
        terms.append(f"(((glon >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((glat >> {i}) & 1) << {2 * i})")
    interleave = " | ".join(terms)
    chars = " || ".join(
        f"substr('{GEOHASH_ALPHABET}', 1 + CAST((gh_code >> {s}) & 31 AS INTEGER), 1)"
        for s in (25, 20, 15, 10, 5, 0)
    )
    scale = float(1 << GEOHASH_BITS)
    return f"""
WITH pts AS (
  SELECT event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT event_id,
         least(greatest(CAST(floor((lon + 180.0) / 360.0 * {scale}) AS BIGINT), 0), {int(scale) - 1}) AS glon,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {scale}) AS BIGINT), 0), {int(scale) - 1}) AS glat
  FROM pts),
c AS (SELECT event_id, {interleave} AS gh_code FROM xy)
SELECT event_id, gh_code, {chars} AS geohash6 FROM c
"""


SQL_GEOHASH = _sql_geohash()


# ---------------------------------------------------------------------------
# turn statistics: left/right/straight counts along each trajectory
# ---------------------------------------------------------------------------
#
# The trajectory-shape report (map-matching / driving-behavior
# pipelines classify turns before anything else): over each user's
# (ts, event_id)-ordered integer vertex chain, every interior vertex is
# classified by the SIGN of the cross product (p1-p0) x (p2-p1) —
# exact int64 arithmetic, so the left/right/straight trichotomy can
# never wobble on float rounding.  Same ring coordinates and the same
# one-shuffle + vectorized-per-group physics as ring_area.

def q_turn_stats(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def fold(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        e = eid[order]
        x = (e * RING_XM) % RING_MOD
        y = (e * RING_YM) % RING_MOD
        if len(e) < 3:
            # no interior vertex -> no report row (matches the oracle,
            # whose LAG/LEAD guard drops these users entirely)
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_left": pa.array([], type=pa.int64()),
                    "n_right": pa.array([], type=pa.int64()),
                    "n_straight": pa.array([], type=pa.int64()),
                }
            )
        v1x, v1y = np.diff(x)[:-1], np.diff(y)[:-1]
        v2x, v2y = np.diff(x)[1:], np.diff(y)[1:]
        cross = v1x * v2y - v1y * v2x
        left = int((cross > 0).sum())
        right = int((cross < 0).sum())
        straight = int((cross == 0).sum())
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "n_left": pa.array([left], type=pa.int64()),
                "n_right": pa.array([right], type=pa.int64()),
                "n_straight": pa.array([straight], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_TURN_STATS = f"""
WITH v AS (
  SELECT user_id, ts, event_id,
         (event_id * {RING_XM}) % {RING_MOD} AS x,
         (event_id * {RING_YM}) % {RING_MOD} AS y
  FROM events),
t AS (
  SELECT user_id,
         x - LAG(x) OVER w AS v1x, y - LAG(y) OVER w AS v1y,
         LEAD(x) OVER w - x AS v2x, LEAD(y) OVER w - y AS v2y
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (
  SELECT user_id, v1x * v2y - v1y * v2x AS cr
  FROM t WHERE v1x IS NOT NULL AND v2x IS NOT NULL)
SELECT user_id,
       CAST(SUM(CASE WHEN cr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_left,
       CAST(SUM(CASE WHEN cr < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_right,
       CAST(SUM(CASE WHEN cr = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_straight
FROM c GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# polyline self-intersections (ST_IsSimple via exact orientation tests)
# ---------------------------------------------------------------------------
#
# The computational-geometry validity check (is the trajectory simple?):
# count PROPER crossings between non-adjacent segments of each user's
# (ts, event_id)-ordered polyline.  The crossing predicate is the
# classic four-orientation test — orient(a1,a2,b1)*orient(a1,a2,b2) < 0
# AND orient(b1,b2,a1)*orient(b1,b2,a2) < 0 — on INTEGER coordinates,
# so every sign is exact and the count is bit-reproducible (collinear /
# endpoint-touching contacts are excluded by the strict inequalities,
# the standard "proper intersection" definition).  Per-group work is a
# vectorized O(s^2) orientation matrix bounded by max segments per
# user (a geometry invariant), after one user-keyed shuffle.

def q_self_intersections(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def fold(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        e = eid[order]
        if len(e) < 2:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_segments": pa.array([], type=pa.int64()),
                    "n_crossings": pa.array([], type=pa.int64()),
                }
            )
        x = (e * RING_XM) % RING_MOD
        y = (e * RING_YM) % RING_MOD
        ax, ay = x[:-1], y[:-1]
        bx, by = x[1:], y[1:]
        s = len(ax)

        def orient(px, py, qx, qy, rx, ry):
            return (qx - px) * (ry - py) - (qy - py) * (rx - px)

        # pairwise (i, j) orientation products, j >= i + 2
        o1 = orient(ax[:, None], ay[:, None], bx[:, None], by[:, None], ax[None, :], ay[None, :])
        o2 = orient(ax[:, None], ay[:, None], bx[:, None], by[:, None], bx[None, :], by[None, :])
        o3 = orient(ax[None, :], ay[None, :], bx[None, :], by[None, :], ax[:, None], ay[:, None])
        o4 = orient(ax[None, :], ay[None, :], bx[None, :], by[None, :], bx[:, None], by[:, None])
        cross = (o1 * o2 < 0) & (o3 * o4 < 0)
        jj, ii = np.meshgrid(np.arange(s), np.arange(s))
        n_cross = int((cross & (jj >= ii + 2)).sum())
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "n_segments": pa.array([s], type=pa.int64()),
                "n_crossings": pa.array([n_cross], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_SELF_INTERSECTIONS = f"""
WITH v AS (
  SELECT user_id, ts, event_id,
         (event_id * {RING_XM}) % {RING_MOD} AS x,
         (event_id * {RING_YM}) % {RING_MOD} AS y
  FROM events),
s AS (
  SELECT user_id,
         ROW_NUMBER() OVER w AS i,
         x AS ax, y AS ay, LEAD(x) OVER w AS bx, LEAD(y) OVER w AS by
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
seg AS (SELECT * FROM s WHERE bx IS NOT NULL),
pairs AS (
  SELECT a.user_id,
         ((a.bx - a.ax) * (b.ay - a.ay) - (a.by - a.ay) * (b.ax - a.ax))
       * ((a.bx - a.ax) * (b.by - a.ay) - (a.by - a.ay) * (b.bx - a.ax)) AS p1,
         ((b.bx - b.ax) * (a.ay - b.ay) - (b.by - b.ay) * (a.ax - b.ax))
       * ((b.bx - b.ax) * (a.by - b.ay) - (b.by - b.ay) * (a.bx - b.ax)) AS p2
  FROM seg a JOIN seg b ON a.user_id = b.user_id AND b.i >= a.i + 2)
SELECT c.user_id,
       CAST(c.n AS BIGINT) AS n_segments,
       CAST(COALESCE(x.n, 0) AS BIGINT) AS n_crossings
FROM (SELECT user_id, COUNT(*) AS n FROM seg GROUP BY user_id) c
LEFT JOIN (
  SELECT user_id, COUNT(*) AS n FROM pairs WHERE p1 < 0 AND p2 < 0 GROUP BY user_id
) x USING (user_id)
"""


# ---------------------------------------------------------------------------
# trajectory diameter: farthest point pair per user (convex-hull prune)
# ---------------------------------------------------------------------------
#
# ST_MaxDistance / trip-extent shape: the maximum squared planar
# distance between any two of a user's points, EXACT in the integer
# centi-degree grid the point field is synthesized on (dx,dy <= 36000,
# so dx^2+dy^2 < 2^32 — int64 never overflows).  Plan: one user-keyed
# shuffle; inside each group an Andrew-monotone-chain convex hull over
# the (deduplicated, sorted) integer points — O(n log n), cross
# products in exact int64 — then a vectorized all-pairs pass over HULL
# vertices only (h << n; the diameter is attained at hull vertices).
# Scale bound: max points per user, the same per-key contract as
# user_journey / trajectory_len (SURVEY §2.6).


def _prune_chain(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized QuickHull refinement of the UPPER convex chain over a
    strictly-increasing-x integer point list; returns indices into
    x/y.  Each round assigns every point to its current chain segment
    with ONE searchsorted, picks the max-cross point per segment (the
    farthest from the segment line — always a boundary point) with ONE
    lexsort, and inserts them all simultaneously — O(log h) vectorized
    rounds, no per-point Python (round-4 VERDICT Next #6).  Cross
    products are exact int64 for coordinate spreads < 2^31."""
    n = len(x)
    cx = np.array([0, max(n - 1, 0)], dtype=np.int64)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    idx_all = np.arange(n, dtype=np.int64)
    while True:
        seg = np.clip(np.searchsorted(x[cx], x, side="right") - 1, 0, len(cx) - 2)
        a, b = cx[seg], cx[seg + 1]
        cross = (x[b] - x[a]) * (y - y[a]) - (y[b] - y[a]) * (x - x[a])
        above = cross > 0
        if not above.any():
            return cx
        ii = idx_all[above]
        order = np.lexsort((ii, cross[above], seg[above]))
        sii, sseg = ii[order], seg[above][order]
        take = np.r_[sseg[1:] != sseg[:-1], np.array([True])]
        cx = np.unique(np.concatenate([cx, sii[take]]))


def _hull_int(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Convex-boundary candidate set over integer coords, fully
    vectorized: per-distinct-x y-extremes (every hull vertex is one),
    then the vectorized QuickHull chain refinement on the upper and the
    mirrored lower extreme graphs.  Returns a SUPERSET of the hull
    vertices that lies entirely ON the hull boundary (rare collinear
    QuickHull ties may survive), which leaves the diameter exact —
    verified against O(n^2) brute force in
    tests/test_graph_geo.py::test_hull_diameter_matches_brute_force."""
    pts = np.unique(np.stack([xs, ys], axis=1), axis=0)  # sorted lex (x, y)
    if len(pts) <= 2:
        return pts[:, 0], pts[:, 1]
    x, y = pts[:, 0], pts[:, 1]
    xu, first = np.unique(x, return_index=True)
    last = np.r_[first[1:], np.array([len(x)])] - 1
    ylo, yhi = y[first], y[last]  # per-x runs are y-ascending under the lex sort
    up = _prune_chain(xu, yhi)
    lo = _prune_chain(xu, -ylo)
    hull = np.unique(
        np.stack(
            [np.concatenate([xu[up], xu[lo]]), np.concatenate([yhi[up], ylo[lo]])], axis=1
        ),
        axis=0,
    )
    return hull[:, 0], hull[:, 1]


def q_traj_diameter(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def fold(g: pa.Table) -> pa.Table:
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        xi = (eid * 48271) % 36000
        yi = (eid * 16807) % 18000
        hx, hy = _hull_int(xi, yi)
        dx = hx[:, None] - hx[None, :]
        dy = hy[:, None] - hy[None, :]
        diam2 = int((dx * dx + dy * dy).max()) if len(hx) else 0
        return pa.table(
            {
                "user_id": g.column("user_id").slice(0, 1),
                "n_pts": pa.array([len(eid)], type=pa.int64()),
                "diam2": pa.array([diam2], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_TRAJ_DIAMETER = """
WITH p AS (
  SELECT user_id,
         CAST((event_id * 48271) % 36000 AS BIGINT) AS xi,
         CAST((event_id * 16807) % 18000 AS BIGINT) AS yi
  FROM events),
d AS (
  SELECT a.user_id,
         MAX((a.xi - b.xi) * (a.xi - b.xi) + (a.yi - b.yi) * (a.yi - b.yi)) AS diam2
  FROM p a JOIN p b USING (user_id) GROUP BY a.user_id),
h AS (SELECT user_id, COUNT(*) AS n_pts FROM p GROUP BY user_id)
SELECT h.user_id, CAST(h.n_pts AS BIGINT) AS n_pts, CAST(d.diam2 AS BIGINT) AS diam2
FROM h JOIN d USING (user_id)
"""


# ---------------------------------------------------------------------------
# cross-user segment join: trajectory crossing counts between user pairs
# ---------------------------------------------------------------------------
#
# The both-sides-large spatial join the reverse/forward shuffle plans
# demonstrate for points, applied to SEGMENTS: for every pair of users,
# how many times do their polylines properly cross?  Physics: segments
# explode to the grid cells their bbox covers (a crossing pair's bboxes
# intersect, and two intersecting boxes always share the cell of the
# intersection's min corner, so cell co-membership is a lossless
# prefilter); ONE groupby(cell) co-shuffle; each cell group runs the
# vectorized four-orientation exact-int test over cross-user pairs and
# counts a pair ONLY in its canonical cell (the cell of
# (max of bbox-min x, max of bbox-min y) — inside both bboxes by
# construction), so multi-cell pairs are never double-counted and no
# distinct-shuffle is needed; per-cell partial counts Sum-reduce on
# (user_a, user_b).  The oracle pays the full O(S²) cross join, so the
# query samples users (user_id % SEGJ_MOD == 0) to keep SQL tractable —
# the sampling is part of the query definition, not an approximation.

SEGJ_MOD = 5
SEGJ_CS = 250  # cell size over the [0, RING_MOD)² field -> 4x4 grid


def q_segment_join(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def keep_sampled(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(uid % SEGJ_MOD == 0))

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(keep_sampled, batch_format="pyarrow")

    def segments(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        e = eid[order]
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ax": pa.array([], type=pa.int64()),
                "ay": pa.array([], type=pa.int64()),
                "bx": pa.array([], type=pa.int64()),
                "by": pa.array([], type=pa.int64()),
            }
        )
        if len(e) < 2:
            return empty
        x = (e * RING_XM) % RING_MOD
        y = (e * RING_YM) % RING_MOD
        u = int(group.column("user_id")[0].as_py())
        return pa.table(
            {
                "user_id": pa.array(np.full(len(e) - 1, u), type=pa.int64()),
                "ax": pa.array(x[:-1], type=pa.int64()),
                "ay": pa.array(y[:-1], type=pa.int64()),
                "bx": pa.array(x[1:], type=pa.int64()),
                "by": pa.array(y[1:], type=pa.int64()),
            }
        )

    def explode_cells(batch: pa.Table) -> pa.Table:
        ax = batch.column("ax").to_numpy(zero_copy_only=False)
        ay = batch.column("ay").to_numpy(zero_copy_only=False)
        bx = batch.column("bx").to_numpy(zero_copy_only=False)
        by = batch.column("by").to_numpy(zero_copy_only=False)
        x0 = np.minimum(ax, bx) // SEGJ_CS
        x1 = np.maximum(ax, bx) // SEGJ_CS
        y0 = np.minimum(ay, by) // SEGJ_CS
        y1 = np.maximum(ay, by) // SEGJ_CS
        nx = (x1 - x0 + 1).astype(np.int64)
        ny = (y1 - y0 + 1).astype(np.int64)
        reps = nx * ny
        idx = np.repeat(np.arange(len(ax)), reps)
        # within-segment cell offsets, vectorized: position within the
        # repeated run -> (dx, dy) over the segment's nx x ny cover
        st = np.concatenate(([0], np.cumsum(reps)[:-1]))
        pos = np.arange(int(reps.sum())) - st[idx]
        dx = pos // ny[idx]
        dy = pos % ny[idx]
        out = batch.take(pa.array(idx, type=pa.int64()))
        cell = (x0[idx] + dx) * 1000 + (y0[idx] + dy)
        return out.append_column("cell", pa.array(cell, type=pa.int64()))

    def cell_group(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ax = g.column("ax").to_numpy(zero_copy_only=False)
        ay = g.column("ay").to_numpy(zero_copy_only=False)
        bx = g.column("bx").to_numpy(zero_copy_only=False)
        by = g.column("by").to_numpy(zero_copy_only=False)
        cell = int(g.column("cell")[0].as_py())
        ccx, ccy = cell // 1000, cell % 1000
        n = len(u)
        empty = pa.table(
            {
                "user_a": pa.array([], type=pa.int64()),
                "user_b": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
            }
        )
        if n < 2:
            return empty

        def orient(px, py, qx, qy, rx, ry):
            return (qx - px) * (ry - py) - (qy - py) * (rx - px)

        # proper crossing: endpoints of j strictly on opposite sides of i
        # AND vice versa (p1 = o(i; aj)*o(i; bj), p2 = o(j; ai)*o(j; bi))
        o1 = orient(ax[:, None], ay[:, None], bx[:, None], by[:, None], ax[None, :], ay[None, :])
        o2 = orient(ax[:, None], ay[:, None], bx[:, None], by[:, None], bx[None, :], by[None, :])
        p1 = o1 * o2
        p2 = (
            orient(ax[None, :], ay[None, :], bx[None, :], by[None, :], ax[:, None], ay[:, None])
            * orient(ax[None, :], ay[None, :], bx[None, :], by[None, :], bx[:, None], by[:, None])
        )
        hit = (p1 < 0) & (p2 < 0) & (u[:, None] < u[None, :])
        # canonical-cell dedup: count the pair only in the cell of the
        # pairwise (max bbox-min x, max bbox-min y) corner
        mnx = np.minimum(ax, bx)
        mny = np.minimum(ay, by)
        canon_x = np.maximum(mnx[:, None], mnx[None, :]) // SEGJ_CS
        canon_y = np.maximum(mny[:, None], mny[None, :]) // SEGJ_CS
        hit &= (canon_x == ccx) & (canon_y == ccy)
        ii, jj = np.nonzero(hit)
        if len(ii) == 0:
            return empty
        # packed-domain invariant: the (user_a, user_b) composite decodes
        # with // and %, bijective only while 0 <= user_id < 10_000_000
        if len(u):
            assert 0 <= u.min() and u.max() < 10_000_000, (
                "pair packing requires 0 <= user_id < 10_000_000; use a "
                "two-column distinct for wider id domains"
            )
        key = u[ii] * 10_000_000 + u[jj]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "user_a": pa.array(uk // 10_000_000, type=pa.int64()),
                "user_b": pa.array(uk % 10_000_000, type=pa.int64()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    segs = ds.groupby("user_id").map_groups(segments, batch_format="pyarrow")
    cells = segs.map_batches(explode_cells, batch_format="pyarrow")
    partial = cells.groupby("cell").map_groups(cell_group, batch_format="pyarrow")
    out = partial.groupby(["user_a", "user_b"]).aggregate(Sum(on="n", alias_name="n_crossings"))

    def cast_out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_a": batch.column("user_a").cast(pa.int64()),
                "user_b": batch.column("user_b").cast(pa.int64()),
                "n_crossings": batch.column("n_crossings").cast(pa.int64()),
            }
        )

    return out.map_batches(cast_out, batch_format="pyarrow")


SQL_SEGMENT_JOIN = f"""
WITH v AS (
  SELECT user_id, ts, event_id,
         (event_id * {RING_XM}) % {RING_MOD} AS x,
         (event_id * {RING_YM}) % {RING_MOD} AS y
  FROM events WHERE user_id % {SEGJ_MOD} = 0),
s AS (
  SELECT user_id, x AS ax, y AS ay, LEAD(x) OVER w AS bx, LEAD(y) OVER w AS by
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
seg AS (SELECT * FROM s WHERE bx IS NOT NULL),
pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub,
         ((a.bx - a.ax) * (b.ay - a.ay) - (a.by - a.ay) * (b.ax - a.ax))
       * ((a.bx - a.ax) * (b.by - a.ay) - (a.by - a.ay) * (b.bx - a.ax)) AS p1,
         ((b.bx - b.ax) * (a.ay - b.ay) - (b.by - b.ay) * (a.ax - b.ax))
       * ((b.bx - b.ax) * (a.by - b.ay) - (b.by - b.ay) * (a.bx - b.ax)) AS p2
  FROM seg a JOIN seg b ON a.user_id < b.user_id)
SELECT ua AS user_a, ub AS user_b, CAST(COUNT(*) AS BIGINT) AS n_crossings
FROM pairs WHERE p1 < 0 AND p2 < 0 GROUP BY ua, ub
"""


# ---------------------------------------------------------------------------
# extent overlap join: pairs of users whose activity rectangles intersect
# ---------------------------------------------------------------------------
#
# The rectangle-intersection sibling of segment_join (ST_Intersects over
# per-entity envelopes — dedup-blocking and coverage analysis both run
# it).  The point field here is the CLUSTERED synth (each user's points
# live in a 600x600 box anchored by a user-id LCG) so the overlap
# structure is sparse and spatial, unlike the global-uniform field
# whose per-user extents all overlap trivially.  Plan: per-user integer
# extents by native Min/Max partials; each rect explodes to the <=2x2
# grid cells its (<=600-wide) envelope covers; one cell co-shuffle;
# vectorized interval tests per cell with the canonical-cell rule
# (intersecting rects share the cell of the pairwise max-min corner),
# so each overlapping pair is emitted exactly once.

EXT_W = 600          # cluster box width == grid cell size
EXT_XA, EXT_YA = 7919, 104729  # user-anchor LCG multipliers
# anchor space deliberately DENSER than the full field so the overlap
# structure is non-trivial at every sf tier (~19% pair overlap prob)
EXT_AX, EXT_AY = 4200, 1800


def _ext_xy(uid: np.ndarray, eid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = (uid * EXT_XA) % EXT_AX + (eid * RING_XM) % EXT_W
    y = (uid * EXT_YA) % EXT_AY + (eid * RING_YM) % EXT_W
    return x, y


def q_extent_overlap(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def pts(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        x, y = _ext_xy(uid, eid)
        return pa.table(
            {
                "user_id": pa.array(uid, type=pa.int64()),
                "x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64()),
            }
        )

    ext = (
        ds.map_batches(pts, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Min(on="x", alias_name="minx"),
            Max(on="x", alias_name="maxx"),
            Min(on="y", alias_name="miny"),
            Max(on="y", alias_name="maxy"),
        )
    )

    def explode(batch: pa.Table) -> pa.Table:
        mnx = batch.column("minx").to_numpy(zero_copy_only=False)
        mxx = batch.column("maxx").to_numpy(zero_copy_only=False)
        mny = batch.column("miny").to_numpy(zero_copy_only=False)
        mxy = batch.column("maxy").to_numpy(zero_copy_only=False)
        x0, x1 = mnx // EXT_W, mxx // EXT_W
        y0, y1 = mny // EXT_W, mxy // EXT_W
        nx, ny = (x1 - x0 + 1).astype(np.int64), (y1 - y0 + 1).astype(np.int64)
        reps = nx * ny
        idx = np.repeat(np.arange(len(mnx)), reps)
        st = np.concatenate(([0], np.cumsum(reps)[:-1]))
        pos = np.arange(int(reps.sum())) - st[idx]
        dx, dy = pos // ny[idx], pos % ny[idx]
        out = batch.take(pa.array(idx, type=pa.int64()))
        cell = (x0[idx] + dx) * 100_000 + (y0[idx] + dy)
        return out.append_column("cell", pa.array(cell, type=pa.int64()))

    def cell_group(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        mnx = g.column("minx").to_numpy(zero_copy_only=False)
        mxx = g.column("maxx").to_numpy(zero_copy_only=False)
        mny = g.column("miny").to_numpy(zero_copy_only=False)
        mxy = g.column("maxy").to_numpy(zero_copy_only=False)
        cell = int(g.column("cell")[0].as_py())
        ccx, ccy = cell // 100_000, cell % 100_000
        hit = (
            (np.maximum(mnx[:, None], mnx[None, :]) <= np.minimum(mxx[:, None], mxx[None, :]))
            & (np.maximum(mny[:, None], mny[None, :]) <= np.minimum(mxy[:, None], mxy[None, :]))
            & (u[:, None] < u[None, :])
            & (np.maximum(mnx[:, None], mnx[None, :]) // EXT_W == ccx)
            & (np.maximum(mny[:, None], mny[None, :]) // EXT_W == ccy)
        )
        ii, jj = np.nonzero(hit)
        return pa.table(
            {
                "user_a": pa.array(u[ii], type=pa.int64()),
                "user_b": pa.array(u[jj], type=pa.int64()),
            }
        )

    cells = ext.map_batches(explode, batch_format="pyarrow")
    return cells.groupby("cell").map_groups(cell_group, batch_format="pyarrow")


SQL_EXTENT_OVERLAP = f"""
WITH p AS (
  SELECT user_id,
         (user_id * {EXT_XA}) % {EXT_AX} + (event_id * {RING_XM}) % {EXT_W} AS x,
         (user_id * {EXT_YA}) % {EXT_AY} + (event_id * {RING_YM}) % {EXT_W} AS y
  FROM events),
e AS (
  SELECT user_id, MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy
  FROM p GROUP BY user_id)
SELECT a.user_id AS user_a, b.user_id AS user_b
FROM e a JOIN e b ON a.user_id < b.user_id
 AND a.minx <= b.maxx AND b.minx <= a.maxx
 AND a.miny <= b.maxy AND b.miny <= a.maxy
"""


# ---------------------------------------------------------------------------
# max segment speed per trajectory (integer micro-speed, zero-dt guarded)
# ---------------------------------------------------------------------------
#
# The GPS-cleaning / teleport-detection signal: the fastest consecutive
# segment per user in integer micro-units-per-second,
#     speed = (d_int * 1e6) // dt_us   over segments with dt > 0,
# with d_int exactly trajectory_len's scaled segment distance (the one
# float sqrt is IEEE-exactly-rounded and already value-hash gated
# there).  Zero-duration segments (duplicate timestamps) are excluded
# identically on both sides.  One user shuffle, vectorized diff pass.

def q_max_speed(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def fold(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        lon, lat = _pip_lonlat(eid[order])
        if len(lon) < 2:
            return pa.table(
                {
                    "user_id": group.column("user_id").slice(0, 1),
                    "n_moving": pa.array([0], type=pa.int64()),
                    "max_speed": pa.array([None], type=pa.int64()),
                }
            )
        dl = lon[1:] - lon[:-1]
        dp = lat[1:] - lat[:-1]
        d = np.floor(np.sqrt(dl * dl + dp * dp) * TRAJ_SCALE).astype(np.int64)
        dt = np.diff(ts)
        moving = dt > 0
        sp = (d[moving] * 1_000_000) // dt[moving]
        return pa.table(
            {
                "user_id": group.column("user_id").slice(0, 1),
                "n_moving": pa.array([int(moving.sum())], type=pa.int64()),
                "max_speed": pa.array(
                    [int(sp.max()) if len(sp) else None], type=pa.int64()
                ),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_MAX_SPEED = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
seg AS (
  SELECT user_id,
         CAST(floor(sqrt((lon - LAG(lon) OVER w) * (lon - LAG(lon) OVER w)
                       + (lat - LAG(lat) OVER w) * (lat - LAG(lat) OVER w))
                    * {TRAJ_SCALE}) AS BIGINT) AS d,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS dt
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE dt > 0) AS BIGINT) AS n_moving,
       CAST(MAX(CASE WHEN dt > 0 THEN (d * 1000000) // dt END) AS BIGINT) AS max_speed
FROM seg GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# bearing-sector histogram (heading rose) per trajectory
# ---------------------------------------------------------------------------
#
# Per user: how many trajectory segments head into each of the 8
# compass octants — the heading-rose report.  NO trigonometry: the
# octant comes from exact integer sign/magnitude predicates on the
# segment vector (dx, dy) over the shared integer point field, applied
# in the SAME branch order on both sides (np.select here, a CASE chain
# in the oracle), so ties at the diagonals resolve identically.
# Zero-length segments are excluded.  One user shuffle; per-group work
# is a vectorized diff + select.

def _octant_conds(dx, dy, adx, ady):
    """Shared branch ORDER for the 8 sectors (E NE N NW W SW S SE)."""
    return [
        (dx > 0) & (adx >= ady) & (dy >= 0),   # 0: E  (ties E over NE)
        (dx > 0) & (dy > 0),                   # 1: NE (remaining +/+)
        (dy > 0) & (ady >= adx),               # 2: N  (incl dx <= 0)
        (dx < 0) & (dy > 0),                   # 3: NW
        (dx < 0) & (adx >= ady),               # 4: W
        (dx < 0) & (dy < 0),                   # 5: SW
        (dy < 0) & (ady >= adx),               # 6: S
        (dx > 0) & (dy < 0),                   # 7: SE
    ]


def q_bearing_sectors(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def fold(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        x = (eid[order] * RING_XM) % RING_MOD
        y = (eid[order] * RING_YM) % RING_MOD
        dx, dy = np.diff(x), np.diff(y)
        keep = (dx != 0) | (dy != 0)
        dx, dy = dx[keep], dy[keep]
        sec = np.select(_octant_conds(dx, dy, np.abs(dx), np.abs(dy)), np.arange(8), -1)
        n = np.bincount(sec[sec >= 0], minlength=8).astype(np.int64)
        present = np.nonzero(n)[0]
        uid = group.column("user_id").to_numpy(zero_copy_only=False)[0]
        return pa.table(
            {
                "user_id": pa.array(np.full(len(present), uid), type=pa.int64()),
                "sector": pa.array(present.astype(np.int64), type=pa.int64()),
                "n_segments": pa.array(n[present], type=pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(fold, batch_format="pyarrow")


SQL_BEARING_SECTORS = f"""
WITH v AS (
  SELECT user_id, ts, event_id,
         (event_id * {RING_XM}) % {RING_MOD} AS x,
         (event_id * {RING_YM}) % {RING_MOD} AS y
  FROM events),
d AS (
  SELECT user_id,
         x - LAG(x) OVER w AS dx, y - LAG(y) OVER w AS dy
  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id,
         CASE WHEN dx > 0 AND ABS(dx) >= ABS(dy) AND dy >= 0 THEN 0
              WHEN dx > 0 AND dy > 0 THEN 1
              WHEN dy > 0 AND ABS(dy) >= ABS(dx) THEN 2
              WHEN dx < 0 AND dy > 0 THEN 3
              WHEN dx < 0 AND ABS(dx) >= ABS(dy) THEN 4
              WHEN dx < 0 AND dy < 0 THEN 5
              WHEN dy < 0 AND ABS(dy) >= ABS(dx) THEN 6
              WHEN dx > 0 AND dy < 0 THEN 7
         END AS sector
  FROM d WHERE dx IS NOT NULL AND NOT (dx = 0 AND dy = 0))
SELECT user_id, CAST(sector AS BIGINT) AS sector, CAST(COUNT(*) AS BIGINT) AS n_segments
FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Moran's I (global spatial autocorrelation over the hotspot grid)
# ---------------------------------------------------------------------------
#
# THE textbook geo-statistics scalar: are point densities spatially
# clustered (I > 0), dispersed (I < 0), or random (I ~ 0)?  Computed
# over the same 64x64 HOTSPOT_LEVEL lattice as spatial_hotspots with
# queen (8-neighbor) weights, lon wrap, lat clamp — ZERO cells count
# (Moran's I is over the full lattice, not just occupied cells).
#
# Distributed shape: the point stream collapses to per-cell counts in
# one grid-bounded shuffle (<= 4096 rows regardless of input size);
# the final fold runs on the driver over the dense lattice in PYTHON
# ARBITRARY-PRECISION ints — the N-scaled deviation d_i = N*x_i - S
# squares to ~1e21 already at the sf1 bench tier, past int64, so this
# is the genuine object-int path (not a comment promising one).
# Output is ONE row; the only float ops are the final int->double
# conversions and one division, IEEE-identical to DuckDB's
# hugeint->double cast and division.

def q_morans_i(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
        .map_batches(_hotspot_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()  # grid-bounded: <= 4096 rows
    )
    lat = [[0] * _N for _ in range(_N)]
    for r in counts:
        lat[int(r["x"])][int(r["y"])] = int(r["n"])
    nc = _N * _N
    s = sum(map(sum, lat))
    # d[i] = nc*x[i] - s  (Python ints: immune to the 1e21 square)
    d = [[nc * lat[x][y] - s for y in range(_N)] for x in range(_N)]
    num = 0
    den = 0
    w = 0
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    for x in range(_N):
        for y in range(_N):
            di = d[x][y]
            den += di * di
            for dx, dy in offs:
                ny = y + dy
                if 0 <= ny < _N:
                    w += 1
                    num += di * d[(x + dx) % _N][ny]
    morans = float(nc * num) / float(w * den) if den else 0.0
    out = pa.table(
        {
            "n_cells": pa.array([nc], type=pa.int64()),
            "w_sum": pa.array([w], type=pa.int64()),
            "num": pa.array([float(num)], type=pa.float64()),
            "den": pa.array([float(den)], type=pa.float64()),
            "morans_i": pa.array([morans], type=pa.float64()),
        }
    )
    return rd.from_arrow(out)


SQL_MORANS_I = f"""
WITH pts AS (
  SELECT ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_N}) AS BIGINT), 0), {_N - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {_N}) AS BIGINT), 0), {_N - 1}) AS y
  FROM pts),
occ AS (SELECT x, y, COUNT(*) AS n FROM xy GROUP BY x, y),
lattice AS (
  SELECT a.range AS x, b.range AS y FROM range(0, {_N}) a, range(0, {_N}) b),
cells AS (
  SELECT l.x, l.y, COALESCE(o.n, 0) AS n FROM lattice l LEFT JOIN occ o USING (x, y)),
st AS (SELECT SUM(n) AS s, COUNT(*) AS nc FROM cells),
d AS (
  SELECT x, y, (SELECT nc FROM st) * n - (SELECT s FROM st) AS dv FROM cells),
offs AS (
  SELECT dx, dy
  FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)
  WHERE NOT (dx = 0 AND dy = 0)),
pairs AS (
  SELECT d1.dv AS di, d2.dv AS dj
  FROM d d1
  JOIN offs o ON TRUE
  JOIN d d2 ON d2.x = (d1.x + o.dx + {_N}) % {_N} AND d2.y = d1.y + o.dy),
agg AS (
  SELECT (SELECT nc FROM st) AS nc,
         COUNT(*) AS w,
         SUM(di * dj) AS num,
         (SELECT SUM(dv * dv) FROM d) AS den
  FROM pairs)
SELECT CAST(nc AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS w_sum,
       CAST(num AS DOUBLE) AS num, CAST(den AS DOUBLE) AS den,
       CAST(nc * num AS DOUBLE) / CAST(w * den AS DOUBLE) AS morans_i
FROM agg
"""


# ---------------------------------------------------------------------------
# Geary's C (local-contrast sibling of Moran's I, same lattice)
# ---------------------------------------------------------------------------
#
# Geary's contiguity ratio C = ((N-1) * sum_w (x_i - x_j)^2) /
# (2W * sum (x_i - xbar)^2): more sensitive to LOCAL contrast than
# Moran's global cross-product (C < 1 clustered, > 1 dispersed).  Same
# grid-bounded shuffle + driver object-int fold as q_morans_i; the
# numerator (x_i - x_j)^2 needs no mean-centering at all, and the
# denominator uses the scale-free identity
# N * sum(x^2) - S^2 = N * sum((x - xbar)^2), so every carried term is
# an exact integer and the single float op is the final division.

def q_geary_c(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
        .map_batches(_hotspot_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum(on="n", alias_name="n"))
        .take_all()  # grid-bounded: <= 4096 rows
    )
    lat = [[0] * _N for _ in range(_N)]
    for r in counts:
        lat[int(r["x"])][int(r["y"])] = int(r["n"])
    nc = _N * _N
    s = sum(map(sum, lat))
    den = nc * sum(v * v for row in lat for v in row) - s * s  # N*sum((x-xbar)^2)*N
    num = 0
    w = 0
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]
    for x in range(_N):
        for y in range(_N):
            xi = lat[x][y]
            for dx, dy in offs:
                ny = y + dy
                if 0 <= ny < _N:
                    w += 1
                    dxy = xi - lat[(x + dx) % _N][ny]
                    num += dxy * dxy
    # C = ((N-1) * num) / (2W * den/N)  ->  ((N-1) * num * N) / (2W * den)
    geary = float((nc - 1) * num * nc) / float(2 * w * den) if den else 0.0
    out = pa.table(
        {
            "n_cells": pa.array([nc], type=pa.int64()),
            "w_sum": pa.array([w], type=pa.int64()),
            "num": pa.array([float(num)], type=pa.float64()),
            "den": pa.array([float(den)], type=pa.float64()),
            "geary_c": pa.array([geary], type=pa.float64()),
        }
    )
    return rd.from_arrow(out)


SQL_GEARY_C = f"""
WITH pts AS (
  SELECT ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_N}) AS BIGINT), 0), {_N - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {_N}) AS BIGINT), 0), {_N - 1}) AS y
  FROM pts),
occ AS (SELECT x, y, COUNT(*) AS n FROM xy GROUP BY x, y),
lattice AS (
  SELECT a.range AS x, b.range AS y FROM range(0, {_N}) a, range(0, {_N}) b),
cells AS (
  SELECT l.x, l.y, COALESCE(o.n, 0) AS n FROM lattice l LEFT JOIN occ o USING (x, y)),
st AS (SELECT SUM(n) AS s, COUNT(*) AS nc, SUM(n * n) AS n2 FROM cells),
offs AS (
  SELECT dx, dy
  FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)
  WHERE NOT (dx = 0 AND dy = 0)),
pairs AS (
  SELECT c1.n AS ni, c2.n AS nj
  FROM cells c1
  JOIN offs o ON TRUE
  JOIN cells c2 ON c2.x = (c1.x + o.dx + {_N}) % {_N} AND c2.y = c1.y + o.dy),
agg AS (
  SELECT (SELECT nc FROM st) AS nc,
         COUNT(*) AS w,
         SUM((ni - nj) * (ni - nj)) AS num,
         (SELECT nc * n2 - s * s FROM st) AS den
  FROM pairs)
SELECT CAST(nc AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS w_sum,
       CAST(num AS DOUBLE) AS num, CAST(den AS DOUBLE) AS den,
       CAST((nc - 1) * num * nc AS DOUBLE) / CAST(2 * w * den AS DOUBLE) AS geary_c
FROM agg
"""


# ---------------------------------------------------------------------------
# tile revenue pyramid (raster rollup of money — region_value's sibling)
# ---------------------------------------------------------------------------
#
# Revenue heat-tiles at every zoom level 0..PYR_Z: each event's point
# lands in its finest-level tile WITH its exact integer cents, and
# coarser levels roll up by the (x >> 1, y >> 1) halving identity
# (floor(v * 2^z) == floor(v * 2^Z) >> (Z - z) for v >= 0, so halving
# the finest grid IS the direct computation at every z — the oracle
# spells the same shift).  After the first grid-bounded groupby
# nothing is proportional to the input: PYR_Z more shuffles of
# <= 4^z rows each, finest level materialized once.

def q_tile_revenue(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        cents = np.floor(
            batch.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        lon, lat = _pip_lonlat(eid)
        m = 1 << PYR_Z
        x = np.clip(np.floor((lon + 180.0) / 360.0 * m).astype(np.int64), 0, m - 1)
        y = np.clip(np.floor((lat + 90.0) / 180.0 * m).astype(np.int64), 0, m - 1)
        key, inv = np.unique(x * m + y, return_inverse=True)
        n = np.bincount(inv, minlength=len(key)).astype(np.int64)
        acc = np.zeros(len(key), dtype=np.int64)
        np.add.at(acc, inv, cents)
        return pa.table(
            {
                "x": pa.array(key // m, type=pa.int64()),
                "y": pa.array(key % m, type=pa.int64()),
                "n": pa.array(n, type=pa.int64()),
                "cents": pa.array(acc, type=pa.int64()),
            }
        )

    finest = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum(on="n", alias_name="n"), Sum(on="cents", alias_name="cents"))
        .materialize()  # <= 4^PYR_Z rows: the pyramid working set
    )

    def stamp(z: int):
        shift = PYR_Z - z

        def f(batch: pa.Table) -> pa.Table:
            x = batch.column("x").to_numpy(zero_copy_only=False) >> shift
            y = batch.column("y").to_numpy(zero_copy_only=False) >> shift
            return pa.table(
                {
                    "z": pa.array(np.full(batch.num_rows, z), type=pa.int64()),
                    "x": pa.array(x, type=pa.int64()),
                    "y": pa.array(y, type=pa.int64()),
                    "n": batch.column("n"),
                    "cents": batch.column("cents"),
                }
            )

        return f

    levels = []
    for z in range(PYR_Z + 1):
        levels.append(
            finest.map_batches(stamp(z), batch_format="pyarrow")
            .groupby(["z", "x", "y"])
            .aggregate(Sum(on="n", alias_name="n"), Sum(on="cents", alias_name="cents"))
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def _sql_tile_revenue() -> str:
    m = 1 << PYR_Z
    lvls = ",\n    ".join(f"({z})" for z in range(PYR_Z + 1))
    return f"""
WITH pts AS (
  SELECT CAST(floor(value * 100.0) AS BIGINT) AS cents,
         ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,
         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat
  FROM events),
xy AS (
  SELECT cents,
         least(greatest(CAST(floor((lon + 180.0) / 360.0 * {m}) AS BIGINT), 0), {m - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {m}) AS BIGINT), 0), {m - 1}) AS y
  FROM pts),
lv(z) AS (VALUES
    {lvls})
SELECT lv.z, xy.x >> ({PYR_Z} - lv.z) AS x, xy.y >> ({PYR_Z} - lv.z) AS y,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM xy, lv
GROUP BY 1, 2, 3
"""


SQL_TILE_REVENUE = _sql_tile_revenue()
