"""Distance kernels: haversine + planar, and a brute-force kNN helper.

Used by the kNN fallback of reverse geocoding (GeoAdmin ``identify`` with
``tolerance`` — /root/reference/src/geoadmin.rs:260-306) and by property
tests.  All vectorized float64 numpy.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # mean Earth radius (IUGG)


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters; broadcasts like numpy."""
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    a = np.sin(dlat * 0.5) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon * 0.5) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def planar_sq_deg(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Squared planar distance in degrees^2 — trig-free, bit-reproducible
    across numpy and SQL engines (same expression order), used where the
    correctness oracle must match bit-exactly."""
    dx = np.asarray(lon1, dtype=np.float64) - np.asarray(lon2, dtype=np.float64)
    dy = np.asarray(lat1, dtype=np.float64) - np.asarray(lat2, dtype=np.float64)
    return dx * dx + dy * dy


def knn_brute(
    qlon: np.ndarray,
    qlat: np.ndarray,
    plon: np.ndarray,
    plat: np.ndarray,
    k: int = 1,
    max_dist_m: float | None = None,
    metric: str = "haversine",
) -> tuple[np.ndarray, np.ndarray]:
    """k nearest places per query point, deterministic tie-break by
    (distance, place index).  Returns (indices [nq, k], dists [nq, k]);
    misses (beyond max_dist_m or fewer than k places) are -1 / inf.
    """
    nq = len(qlon)
    npl = len(plon)
    if npl == 0:
        return (np.full((nq, k), -1, dtype=np.int64), np.full((nq, k), np.inf))
    if metric == "haversine":
        d = haversine_m(
            np.asarray(qlon)[:, None], np.asarray(qlat)[:, None], np.asarray(plon)[None, :], np.asarray(plat)[None, :]
        )
    else:
        d = planar_sq_deg(
            np.asarray(qlon)[:, None], np.asarray(qlat)[:, None], np.asarray(plon)[None, :], np.asarray(plat)[None, :]
        )
    kk = min(k, npl)
    # lexsort-free deterministic top-k: argsort is stable, so equal
    # distances resolve to the lower place index.
    idx = np.argsort(d, axis=1, kind="stable")[:, :kk]
    dd = np.take_along_axis(d, idx, axis=1)
    out_idx = np.full((nq, k), -1, dtype=np.int64)
    out_d = np.full((nq, k), np.inf)
    out_idx[:, :kk] = idx
    out_d[:, :kk] = dd
    if max_dist_m is not None:
        miss = out_d > max_dist_m
        out_idx[miss] = -1
        out_d[miss] = np.inf
    return out_idx, out_d
