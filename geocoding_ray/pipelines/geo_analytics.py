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
