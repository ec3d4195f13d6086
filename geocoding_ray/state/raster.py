"""Raster <-> vector conversion over the cell grid (north_rule: the
engine's tiling side).

* :func:`build_raster` — vector -> raster: burn the admin polygon set
  into a dense 2^L x 2^L grid of winning admin ids by running the exact
  deepest-wins PIP on every cell *center* (one batched ``locate`` pass;
  level 10 = 1,048,576 cells in ~1-2 s driver-side).
* :class:`RasterLookup` — O(1) reverse geocoding against the broadcast
  raster: point -> cell -> admin id, one fancy-indexed gather per batch.
  Exact for points whose cell center shares their polygon (i.e. away
  from boundaries by > one cell diagonal); the vector path remains the
  exact reference.
* :func:`vectorize_raster` — raster -> vector: per admin id, the cell
  count and tight cell-aligned bounding box (the rough-geometry
  extraction used for pruning and cell-cover statistics).

The raster is a plain int64 ndarray (uint64 admin ids don't fit SQL
comparisons; 0 = no admin), ~8 MiB at level 10 — broadcast once via
``ray.put`` like every other immutable index (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np

from . import cells


def build_raster(admin_index, level: int = 10, batch_rows: int = 64) -> np.ndarray:
    """Burn the admin set into a (2^L, 2^L) grid of admin ids (0=none).

    Grid centers are tested with the exact deepest-wins PIP
    (AdminIndex.locate), so raster and vector paths agree by
    construction wherever a point's cell center lies in the same
    polygon.
    """
    n = 1 << level
    nf = float(n)
    raster = np.zeros((n, n), dtype=np.int64)
    ys = (np.arange(n, dtype=np.float64) + 0.5) / nf * 180.0 - 90.0
    xs = (np.arange(n, dtype=np.float64) + 0.5) / nf * 360.0 - 180.0
    for y0 in range(0, n, batch_rows):
        y1 = min(y0 + batch_rows, n)
        gy, gx = np.meshgrid(ys[y0:y1], xs, indexing="ij")
        win = admin_index.locate(gx.ravel(), gy.ravel())
        ids = np.where(win >= 0, admin_index.admin_id[np.clip(win, 0, None)].astype(np.int64), 0)
        raster[:, y0:y1] = ids.reshape(y1 - y0, n).T  # [x, y] layout
    return raster


def raster_lookup_xy(raster: np.ndarray, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized point -> admin id via the raster ([x, y] layout)."""
    level = int(np.log2(raster.shape[0]))
    x, y = cells.lonlat_to_xy(lon, lat, level)
    return raster[x.astype(np.int64), y.astype(np.int64)]


def vectorize_raster(raster: np.ndarray) -> dict[int, tuple[int, float, float, float, float]]:
    """Raster -> vector: admin id -> (cell_count, minx, miny, maxx, maxy)
    cell-aligned bounding box in lon-lat."""
    n = raster.shape[0]
    nf = float(n)
    ids = np.unique(raster)
    out: dict[int, tuple[int, float, float, float, float]] = {}
    for a in ids:
        if a == 0:
            continue
        xs, ys = np.nonzero(raster == a)
        minx = xs.min() / nf * 360.0 - 180.0
        maxx = (xs.max() + 1) / nf * 360.0 - 180.0
        miny = ys.min() / nf * 180.0 - 90.0
        maxy = (ys.max() + 1) / nf * 180.0 - 90.0
        out[int(a)] = (len(xs), minx, miny, maxx, maxy)
    return out


class RasterLookup:
    """Actor-pool stage: O(1) raster reverse lookup per point.

    ``__init__`` fetches the broadcast raster once per actor; per batch
    the lookup is two integer ops and one gather — the fast path for
    coarse geocoding (country/state tagging) where boundary-cell
    precision is acceptable.
    """

    def __init__(self, raster_ref):
        import ray

        self.raster: np.ndarray = ray.get(raster_ref) if not isinstance(raster_ref, np.ndarray) else raster_ref

    def __call__(self, batch):
        import pyarrow as pa

        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        valid = ~(np.isnan(lon) | np.isnan(lat))
        ids = np.zeros(len(lon), dtype=np.int64)
        if valid.any():
            ids[valid] = raster_lookup_xy(self.raster, lon[valid], lat[valid])
        return batch.append_column("raster_admin_id", pa.array(ids, type=pa.int64()))
