"""Point annotations — the engine's analogue of OpenCage's ``Annotations``
document (/root/reference/src/opencage.rs:581-599): DMS strings, the
geohash-role cell index (opencage.rs:594 — here the quadkey), Mercator
x/y, plus the pure-math fringe — MGRS, Maidenhead, qibla, sunrise/set,
flag emoji, a reversible three-word cell code (the what3words ROLE over
an engine wordlist) and a SOLAR-approximation timezone
(``state/geodesy.py``), with callingcode/currency from the built-in
country table (``functions/country.annotate_country``).  Real IANA
timezones and the proprietary w3w assignment need external data and are
explicitly approximated, not faked.

All formatting is byte-stable (fixed decimals, no locale) per SURVEY.md
§7 hard part 2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state import cells
from ..state.crs import project_points
from ..state.geodesy import flag_emoji, maidenhead, mgrs, qibla, solar_timezone, sun_rise_set, threeword

# Fixed default observation day for the sun.rise/set annotation
# (opencage.rs:620-624) so outputs stay deterministic: 2024-03-20 UTC.
DEFAULT_SUN_TS = 1_710_892_800


def _dms(value: float, pos: str, neg: str) -> str:
    """DMS render, OpenCage style: ``41° 24' 5.00040'' N``."""
    ref = pos if value >= 0 else neg
    v = abs(value)
    deg = int(v)
    rem = (v - deg) * 60.0
    minutes = int(rem)
    seconds = (rem - minutes) * 60.0
    return f"{deg}° {minutes}' {seconds:.5f}'' {ref}"


def annotate_points(batch: pa.Table, level: int = 9, sun_ts: int = DEFAULT_SUN_TS) -> pa.Table:
    """Adds DMS, quadkey (the OpenCage-geohash analogue), cell id,
    Web-Mercator x/y, MGRS, Maidenhead, qibla and sun rise/set columns
    for lon/lat rows; null GPS rows stay null.  A ``country_code``
    column, when present, also yields the ``flag`` emoji."""
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    valid = ~(np.isnan(lon) | np.isnan(lat))

    dms_lat = np.full(len(lon), None, dtype=object)
    dms_lon = np.full(len(lon), None, dtype=object)
    qk = np.full(len(lon), None, dtype=object)
    cell = np.zeros(len(lon), dtype=np.uint64)
    mx = np.full(len(lon), np.nan)
    my = np.full(len(lon), np.nan)
    mg = np.full(len(lon), None, dtype=object)
    mh = np.full(len(lon), None, dtype=object)
    qb = np.full(len(lon), np.nan)
    s_rise = np.full(len(lon), -1, dtype=np.int64)
    s_set = np.full(len(lon), -1, dtype=np.int64)
    tw = np.full(len(lon), None, dtype=object)
    tz_off = np.zeros(len(lon), dtype=np.int64)
    tz_str = np.full(len(lon), None, dtype=object)
    tz_name = np.full(len(lon), None, dtype=object)

    if valid.any():
        vi = np.nonzero(valid)[0]
        c = cells.encode(lon[valid], lat[valid], level)
        cell[valid] = c
        keys = cells.render_quadkey(c)
        e, n = project_points(lon[valid], np.clip(lat[valid], -85.05112878, 85.05112878), "3857")
        mx[valid] = e
        my[valid] = n
        mg_v = mgrs(lon[valid], lat[valid])
        mh_v = maidenhead(lon[valid], lat[valid])
        qb[valid] = qibla(lon[valid], lat[valid])
        r_v, st_v = sun_rise_set(lon[valid], lat[valid], np.full(valid.sum(), sun_ts))
        s_rise[valid] = r_v
        s_set[valid] = st_v
        tw_v = threeword(lon[valid], lat[valid])
        off_v, ostr_v, name_v = solar_timezone(lon[valid])
        tz_off[valid] = off_v
        for j, i in enumerate(vi):
            dms_lat[i] = _dms(lat[i], "N", "S")
            dms_lon[i] = _dms(lon[i], "E", "W")
            qk[i] = keys[j]
            mg[i] = mg_v[j]
            mh[i] = mh_v[j]
            tw[i] = tw_v[j]
            tz_str[i] = ostr_v[j]
            tz_name[i] = name_v[j]

    out = batch
    out = out.append_column("dms_lat", pa.array(dms_lat.tolist(), type=pa.string()))
    out = out.append_column("dms_lon", pa.array(dms_lon.tolist(), type=pa.string()))
    out = out.append_column("quadkey", pa.array(qk.tolist(), type=pa.string()))
    out = out.append_column("ann_cell_id", pa.array(cell, type=pa.uint64()))
    out = out.append_column("mercator_x", pa.array(np.where(np.isnan(mx), None, mx), type=pa.float64(), from_pandas=True))
    out = out.append_column("mercator_y", pa.array(np.where(np.isnan(my), None, my), type=pa.float64(), from_pandas=True))
    out = out.append_column("mgrs", pa.array(mg.tolist(), type=pa.string()))
    out = out.append_column("maidenhead", pa.array(mh.tolist(), type=pa.string()))
    out = out.append_column("qibla", pa.array(np.where(np.isnan(qb), None, np.round(qb, 2)), type=pa.float64(), from_pandas=True))
    out = out.append_column("sun_rise", pa.array(s_rise, type=pa.int64()))
    out = out.append_column("sun_set", pa.array(s_set, type=pa.int64()))
    out = out.append_column("threeword", pa.array(tw.tolist(), type=pa.string()))
    out = out.append_column("tz_offset_sec", pa.array(tz_off, type=pa.int64()))
    out = out.append_column("tz_offset_string", pa.array(tz_str.tolist(), type=pa.string()))
    out = out.append_column("tz_name", pa.array(tz_name.tolist(), type=pa.string()))
    if "country_code" in batch.column_names:
        out = out.append_column(
            "flag", pa.array(flag_emoji(batch.column("country_code").to_pylist()), type=pa.string())
        )
    return out
