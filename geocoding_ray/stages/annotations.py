"""Point annotations — the engine's analogue of OpenCage's ``Annotations``
document (/root/reference/src/opencage.rs:581-599): DMS strings, the
geohash-role cell index (opencage.rs:594 — here the quadkey), Mercator
x/y, and the calling-code/timezone fringe stubbed where it would need
external data.

All formatting is byte-stable (fixed decimals, no locale) per SURVEY.md
§7 hard part 2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state import cells
from ..state.crs import project_points


def _dms(value: float, pos: str, neg: str) -> str:
    """DMS render, OpenCage style: ``41° 24' 5.00040'' N``."""
    ref = pos if value >= 0 else neg
    v = abs(value)
    deg = int(v)
    rem = (v - deg) * 60.0
    minutes = int(rem)
    seconds = (rem - minutes) * 60.0
    return f"{deg}° {minutes}' {seconds:.5f}'' {ref}"


def annotate_points(batch: pa.Table, level: int = 9) -> pa.Table:
    """Adds DMS, quadkey (the OpenCage-geohash analogue), cell id and
    Web-Mercator x/y columns for lon/lat rows; null GPS rows stay null."""
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    valid = ~(np.isnan(lon) | np.isnan(lat))

    dms_lat = np.full(len(lon), None, dtype=object)
    dms_lon = np.full(len(lon), None, dtype=object)
    qk = np.full(len(lon), None, dtype=object)
    cell = np.zeros(len(lon), dtype=np.uint64)
    mx = np.full(len(lon), np.nan)
    my = np.full(len(lon), np.nan)

    if valid.any():
        vi = np.nonzero(valid)[0]
        c = cells.encode(lon[valid], lat[valid], level)
        cell[valid] = c
        keys = cells.render_quadkey(c)
        e, n = project_points(lon[valid], np.clip(lat[valid], -85.05112878, 85.05112878), "3857")
        mx[valid] = e
        my[valid] = n
        for j, i in enumerate(vi):
            dms_lat[i] = _dms(lat[i], "N", "S")
            dms_lon[i] = _dms(lon[i], "E", "W")
            qk[i] = keys[j]

    out = batch
    out = out.append_column("dms_lat", pa.array(dms_lat.tolist(), type=pa.string()))
    out = out.append_column("dms_lon", pa.array(dms_lon.tolist(), type=pa.string()))
    out = out.append_column("quadkey", pa.array(qk.tolist(), type=pa.string()))
    out = out.append_column("ann_cell_id", pa.array(cell, type=pa.uint64()))
    out = out.append_column("mercator_x", pa.array(np.where(np.isnan(mx), None, mx), type=pa.float64(), from_pandas=True))
    out = out.append_column("mercator_y", pa.array(np.where(np.isnan(my), None, my), type=pa.float64(), from_pandas=True))
    return out
