"""Hierarchical uint64 cell index (quadkey / Morton, H3-res-7-9 analogue).

Plays the role of the cell indexes the reference providers expose:
OpenCage's ``geohash`` annotation (/root/reference/src/opencage.rs:594) and
GeoAdmin's ``geom_quadindex`` string (/root/reference/src/geoadmin.rs:378).

Layout of a cell id (uint64)::

    [ 5 bits level ][ 2*level bits interleaved Morton code ] (low bits)

    cell_id = (level << 58) | morton

Level L divides lon in [-180, 180] into 2^L columns and lat in [-90, 90]
into 2^L rows.  Level 0..29 supported.  Everything is vectorized over
numpy arrays; scalar convenience wrappers accept Python floats.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 29
_LEVEL_SHIFT = 58

# Magic-number bit spreading: place the low 32 bits of x into even bit
# positions of a 64-bit word (standard Morton interleave).
_M = [
    (0x0000_0000_FFFF_FFFF, 0),
    (0x0000_FFFF_0000_FFFF, 16),
    (0x00FF_00FF_00FF_00FF, 8),
    (0x0F0F_0F0F_0F0F_0F0F, 4),
    (0x3333_3333_3333_3333, 2),
    (0x5555_5555_5555_5555, 1),
]


def _spread(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    for mask, shift in _M[1:]:
        x = (x | (x << np.uint64(shift))) & np.uint64(mask)
    return x


def _compact_simple(x: np.ndarray) -> np.ndarray:
    """Inverse of _spread (even bits -> low 32 bits)."""
    x = x.astype(np.uint64) & np.uint64(0x5555_5555_5555_5555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333_3333_3333_3333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F_0F0F_0F0F_0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF_00FF_00FF_00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000_FFFF_0000_FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x0000_0000_FFFF_FFFF)
    return x


def lonlat_to_xy(lon: np.ndarray, lat: np.ndarray, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Continuous lon/lat -> integer column/row at ``level`` (clipped)."""
    n = np.uint64(1) << np.uint64(level)
    nf = float(1 << level)
    x = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * nf).astype(np.int64)
    y = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * nf).astype(np.int64)
    x = np.clip(x, 0, int(n) - 1).astype(np.uint64)
    y = np.clip(y, 0, int(n) - 1).astype(np.uint64)
    return x, y


def encode(lon, lat, level: int) -> np.ndarray:
    """Vectorized lon/lat -> cell id at ``level``."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be 0..{MAX_LEVEL}, got {level}")
    lon = np.atleast_1d(np.asarray(lon, dtype=np.float64))
    lat = np.atleast_1d(np.asarray(lat, dtype=np.float64))
    x, y = lonlat_to_xy(lon, lat, level)
    morton = _spread(x) | (_spread(y) << np.uint64(1))
    return (np.uint64(level) << np.uint64(_LEVEL_SHIFT)) | morton


def cell_from_xy(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Integer column/row at ``level`` -> cell id (vectorized)."""
    morton = _spread(np.asarray(x, dtype=np.uint64)) | (
        _spread(np.asarray(y, dtype=np.uint64)) << np.uint64(1)
    )
    return (np.uint64(level) << np.uint64(_LEVEL_SHIFT)) | morton


def decode_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (level, x, y)."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    level = (cell >> np.uint64(_LEVEL_SHIFT)).astype(np.int64)
    morton = cell & ((np.uint64(1) << np.uint64(_LEVEL_SHIFT)) - np.uint64(1))
    x = _compact_simple(morton)
    y = _compact_simple(morton >> np.uint64(1))
    return level, x, y


def decode_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """cell id -> (lon, lat) of the cell center."""
    level, x, y = decode_xy(cell)
    nf = np.power(2.0, level.astype(np.float64))
    lon = (x.astype(np.float64) + 0.5) / nf * 360.0 - 180.0
    lat = (y.astype(np.float64) + 0.5) / nf * 180.0 - 90.0
    return lon, lat


def cell_bounds(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (minx, miny, maxx, maxy)."""
    level, x, y = decode_xy(cell)
    nf = np.power(2.0, level.astype(np.float64))
    minx = x.astype(np.float64) / nf * 360.0 - 180.0
    miny = y.astype(np.float64) / nf * 180.0 - 90.0
    return minx, miny, minx + 360.0 / nf, miny + 180.0 / nf


def parent(cell, steps: int = 1) -> np.ndarray:
    """Ancestor cell ``steps`` levels up."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    level, x, y = decode_xy(cell)
    if np.any(level - steps < 0):
        raise ValueError("parent below level 0")
    nl = level - steps
    x >>= np.uint64(steps)
    y >>= np.uint64(steps)
    morton = _spread(x) | (_spread(y) << np.uint64(1))
    return (nl.astype(np.uint64) << np.uint64(_LEVEL_SHIFT)) | morton


def neighbors_disk(cell, radius: int = 1) -> np.ndarray:
    """All cells within a (2r+1)x(2r+1) square around each input cell
    (the cell-ring expansion used for kNN fallback — GeoAdmin ``tolerance``
    semantics, /root/reference/src/geoadmin.rs:287).  Returns a 2-D array
    of shape (len(cell), (2r+1)^2); out-of-range rows are clamped, lon wraps.
    """
    cell = np.atleast_1d(np.asarray(cell, dtype=np.uint64))
    level, x, y = decode_xy(cell)
    lev = int(level[0])
    n = np.int64(1 << lev)
    offs = np.arange(-radius, radius + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs, indexing="ij")
    nx = (x.astype(np.int64)[:, None] + dx.ravel()[None, :]) % n  # lon wraps
    ny = np.clip(y.astype(np.int64)[:, None] + dy.ravel()[None, :], 0, n - 1)
    morton = _spread(nx.astype(np.uint64)) | (_spread(ny.astype(np.uint64)) << np.uint64(1))
    return (np.uint64(lev) << np.uint64(_LEVEL_SHIFT)) | morton


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float, level: int) -> np.ndarray:
    """All cells at ``level`` intersecting the bbox (lon-lat, per the
    reference's bbox wire convention lib.rs:168-182)."""
    x0, y0 = lonlat_to_xy(np.array([minx]), np.array([miny]), level)
    x1, y1 = lonlat_to_xy(np.array([maxx]), np.array([maxy]), level)
    xs = np.arange(int(x0[0]), int(x1[0]) + 1, dtype=np.uint64)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1, dtype=np.uint64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    morton = _spread(gx.ravel()) | (_spread(gy.ravel()) << np.uint64(1))
    return (np.uint64(level) << np.uint64(_LEVEL_SHIFT)) | morton


def render_quadkey(cell) -> list[str]:
    """Cell id -> quadkey string (the engine's analogue of GeoAdmin's
    ``geom_quadindex`` string, geoadmin.rs:378)."""
    level, x, y = decode_xy(cell)
    out = []
    for lv, xi, yi in zip(level.tolist(), x.tolist(), y.tolist()):
        digits = []
        for i in range(lv - 1, -1, -1):
            digits.append(str(((yi >> i) & 1) << 1 | ((xi >> i) & 1)))
        out.append("".join(digits))
    return out
