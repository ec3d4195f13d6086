"""dbscan_grid / cell_compact / traj_simplify invariants beyond the
oracle smoke: DBSCAN separation, compaction losslessness, and the
Douglas-Peucker deviation guarantee."""

import numpy as np
import pandas as pd
import pytest

from geocoding_ray.pipelines.geo_cluster import (
    _DN,
    CMP_BASE,
    CMP_TOP,
    TRAJ_EPS,
    _dp_keep,
    q_cell_compact,
    q_dbscan_grid,
    q_traj_simplify,
)

SF = "/root/testdata/sf0.001"


def test_dbscan_five_separated_clusters(ray_session):
    df = q_dbscan_grid(SF).to_pandas()
    assert df["cluster"].nunique() == 5
    # clusters are 8-adjacency-separated: no two cells from different
    # clusters are neighbors (x wraps, y clamps)
    by_cell = {(r.x, r.y): r.cluster for r in df.itertuples()}
    for (x, y), c in by_cell.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = ((x + dx) % _DN, y + dy)
                if nb in by_cell:
                    assert by_cell[nb] == c
    # cluster label is the component's min packed key
    key = df["x"] * _DN + df["y"]
    assert (df.groupby("cluster").apply(lambda g: (g.x * _DN + g.y).min(), include_groups=False).values
            == sorted(df["cluster"].unique())).all()
    assert set(df["cluster"]) <= set(key)


def test_cell_compact_lossless_and_disjoint(ray_session):
    """Expanding every output cell back to leaf level reproduces the
    original occupied leaf set exactly, with no overlaps — the
    compact/uncompact roundtrip that defines H3/S2 compaction."""
    import duckdb

    out = q_cell_compact(SF).to_pandas()
    assert set(out["level"].unique()) <= set(range(CMP_TOP, CMP_BASE + 1))

    leaves = set()
    for r in out.itertuples():
        s = 1 << (CMP_BASE - r.level)
        for ax in range(r.x * s, r.x * s + s):
            for ay in range(r.y * s, r.y * s + s):
                assert (ax, ay) not in leaves, "overlapping footprints"
                leaves.add((ax, ay))

    n = 1 << CMP_BASE
    exp = duckdb.sql(
        f"""
        SELECT DISTINCT
          least(greatest(CAST(floor((((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) AS x,
          least(greatest(CAST(floor((((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}) AS y
        FROM read_parquet('{SF}/events.parquet')
        """
    ).df()
    assert leaves == set(zip(exp["x"], exp["y"]))


def _brute_dev_ok(ix, iy, keep, eps):
    """Every dropped point lies within eps of its covering kept
    segment (checked in float with a 1e-6 slack)."""
    kept_idx = np.nonzero(keep)[0]
    for a, b in zip(kept_idx[:-1], kept_idx[1:]):
        if b - a < 2:
            continue
        x1, y1, x2, y2 = float(ix[a]), float(iy[a]), float(ix[b]), float(iy[b])
        sx = ix[a + 1 : b].astype(float)
        sy = iy[a + 1 : b].astype(float)
        d2 = (x2 - x1) ** 2 + (y2 - y1) ** 2
        if d2 == 0:
            dev = np.sqrt((sx - x1) ** 2 + (sy - y1) ** 2)
        else:
            dev = np.abs((x2 - x1) * (sy - y1) - (y2 - y1) * (sx - x1)) / np.sqrt(d2)
        if not (dev <= eps + 1e-6).all():
            return False
    return True


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dp_keep_invariants(seed):
    rng = np.random.default_rng(seed)
    m = int(rng.integers(3, 400))
    ix = rng.integers(0, 36000, size=m).astype(np.int64)
    iy = rng.integers(0, 18000, size=m).astype(np.int64)
    keep = _dp_keep(ix, iy, TRAJ_EPS)
    assert keep[0] and keep[-1]
    assert _brute_dev_ok(ix, iy, keep, TRAJ_EPS)
    # idempotence: simplifying the kept polyline keeps every point
    k2 = _dp_keep(ix[keep], iy[keep], TRAJ_EPS)
    assert k2.all()


def test_traj_simplify_deterministic(ray_session):
    a = q_traj_simplify(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    b = q_traj_simplify(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_kept"] <= a["n_points"]).all()
    assert (a["n_kept"] >= np.minimum(a["n_points"], 2)).all()
