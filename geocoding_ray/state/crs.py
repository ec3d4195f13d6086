"""CRS transforms — swisstopo approximate WGS84 -> LV03 polynomial.

Constants reproduced exactly from the reference's only geodesy kernel
(``wgs84_to_lv03``, /root/reference/src/geoadmin.rs:311-328; swisstopo
ch1903wgs84 approximation).  The reference applies it to bbox corners of
a GeoAdmin forward query when ``sr`` is 4326 or 3857
(geoadmin.rs:178-187); the engine applies it vectorized over numpy.

Axis conventions (geoadmin.rs:245-255): for sr 2056 (LV95) / 21781 (LV03)
the output point is (easting, northing) = (y_lv, x_lv) **swapped** by the
reference's ``forward``; helpers here return plain (e, n) and the swap is
applied by the projection stage.
"""

from __future__ import annotations

import numpy as np


def wgs84_to_lv03(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized swisstopo polynomial (geoadmin.rs:311-328).

    Returns (east, north) in LV03 (EPSG:21781) meters.  The reference
    subtracts 2_000_000 / 1_000_000 to convert the LV95-looking
    intermediates to LV03 — reproduced exactly.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    # Explicit left-associated multiplies (no pow()) so the expression is
    # bit-reproducible across numpy and SQL engines evaluating the same
    # source order — required by the DuckDB correctness oracle.
    lam = (lon * 3600.0 - 26782.5) / 10000.0
    phi = (lat * 3600.0 - 169028.66) / 10000.0
    x = (
        2600072.37
        + 211455.93 * lam
        - 10938.51 * lam * phi
        - 0.36 * lam * (phi * phi)
        - 44.54 * (lam * lam * lam)
    )
    y = (
        1200147.07
        + 308807.95 * phi
        + 3745.25 * (lam * lam)
        + 76.63 * (phi * phi)
        - 194.56 * (lam * lam) * phi
        + 119.79 * (phi * phi * phi)
    )
    return x - 2000000.0, y - 1000000.0


def lv03_to_lv95(e, n) -> tuple[np.ndarray, np.ndarray]:
    """LV03 -> LV95 is the constant offset the reference bakes into its
    subtraction (geoadmin.rs:325-327 reversed)."""
    return np.asarray(e, dtype=np.float64) + 2000000.0, np.asarray(n, dtype=np.float64) + 1000000.0


SUPPORTED_SR = {"21781", "2056", "4326", "3857"}  # geoadmin.rs:118-121


def project_points(lon, lat, sr: str) -> tuple[np.ndarray, np.ndarray]:
    """Project WGS84 lon/lat to the requested spatial reference, applying
    the reference's per-CRS axis convention (geoadmin.rs:245-255):
    sr 2056/21781 -> returns (easting, northing); 4326 -> (lon, lat);
    3857 -> Web-Mercator meters.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    if sr == "4326":
        return lon, lat
    if sr in ("21781", "2056"):
        e, n = wgs84_to_lv03(lon, lat)
        if sr == "2056":
            e, n = lv03_to_lv95(e, n)
        return e, n
    if sr == "3857":
        R = 6378137.0
        x = np.radians(lon) * R
        y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * R
        return x, y
    raise ValueError(f"unsupported sr {sr!r}; expected one of {sorted(SUPPORTED_SR)}")
