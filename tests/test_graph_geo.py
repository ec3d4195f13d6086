"""Graph + geo-analytics operators: k-ring hotspot smoothing brute
parity (wrap/clamp edges), and PageRank vs a single-node integer
reference on the same edge set."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geocoding_ray.pipelines import geo_analytics as ga
from geocoding_ray.pipelines import graph_queries as gq

SF = "/root/testdata/sf0.001"


class TestHotspots:
    def test_ring_emit_wraps_x_clamps_y(self):
        n = ga._N
        batch = pa.table(
            {
                "x": pa.array([0, n - 1], type=pa.int64()),
                "y": pa.array([0, n - 1], type=pa.int64()),
                "n": pa.array([5, 7], type=pa.int64()),
            }
        )
        out = ga._ring_emit(batch).to_pandas()
        # corner cells: 3x3 minus the 3 positions clamped off in y
        assert len(out) == 12
        assert out["x"].min() == 0 and out["x"].max() == n - 1
        assert set(out[out["ring_n"] == 5]["x"]) == {n - 1, 0, 1}
        assert set(out[out["ring_n"] == 7]["x"]) == {n - 2, n - 1, 0}
        assert out["y"].between(0, n - 1).all()

    def test_matches_dense_convolution(self, ray_session):
        got = ga.q_spatial_hotspots(SF).to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
        # dense reference: histogram the same points, convolve 3x3 by hand
        import pyarrow.parquet as pqt

        eid = (
            pqt.read_table(f"{SF}/events.parquet", columns=["event_id"])
            .column("event_id")
            .to_numpy()
        )
        x, y = ga._grid_xy(eid.astype(np.int64))
        n = ga._N
        grid = np.zeros((n, n), dtype=np.int64)
        np.add.at(grid, (x, y), 1)
        ring = np.zeros_like(grid)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                shifted = np.roll(grid, dx, axis=0)  # x wraps
                if dy == 1:
                    shifted = np.pad(shifted[:, :-1], ((0, 0), (1, 0)))
                elif dy == -1:
                    shifted = np.pad(shifted[:, 1:], ((0, 0), (0, 1)))
                ring += shifted
        gx = got["x"].to_numpy()
        gy = got["y"].to_numpy()
        assert (got["n"].to_numpy() == grid[gx, gy]).all()
        assert (got["ring_n"].to_numpy() == ring[gx, gy]).all()
        assert (got["is_hotspot"].to_numpy() == (9 * grid[gx, gy] > 2 * ring[gx, gy])).all()
        # every nonzero cell present exactly once
        assert len(got) == int((grid > 0).sum())


class TestPageRank:
    @staticmethod
    def _reference(edges: set[tuple[int, int]], iters: int) -> dict[int, int]:
        deg: dict[int, int] = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {v: gq.PR_SCALE for v in deg}
        for _ in range(iters):
            acc: dict[int, int] = {}
            for s, d in edges:
                acc[d] = acc.get(d, 0) + r[s] // deg[s]
            r = {v: gq.PR_BASE + 85 * c // 100 for v, c in acc.items()}
        return r

    def test_matches_single_node_reference(self, ray_session):
        edges_df = gq._build_edges(SF).to_pandas()
        edges = set(zip(edges_df["src"], edges_df["dst"]))
        # symmetric: both directions always present
        assert all((d, s) in edges for s, d in edges)
        exp = self._reference(edges, gq.PR_ITERS)
        got = gq.q_pagerank(SF).to_pandas()
        assert dict(zip(got["node"], got["r"])) == exp
        # damping floor: every rank at least BASE
        assert (got["r"] >= gq.PR_BASE).all()
