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


class TestKnnJoin:
    def test_matches_brute_force_ring(self, ray_session):
        """Brute-force reference over ALL query/db pairs, filtered to the
        declared 3x3-ring window, ranked by (d2, id)."""
        import pyarrow.parquet as pqt

        eid = (
            pqt.read_table(f"{SF}/events.parquet", columns=["event_id"])
            .column("event_id")
            .to_numpy()
            .astype(np.int64)
        )
        from geocoding_ray.pipelines.oracle_queries import _pip_lonlat

        lon, lat = _pip_lonlat(eid)
        n = ga._KN
        x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        y = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
        isq = (eid % ga.KNN_Q_MOD) == 0
        exp = []
        qidx = np.nonzero(isq)[0]
        didx = np.nonzero(~isq)[0]
        for qi in qidx:
            dxm = (x[didx] - x[qi] + n) % n
            in_ring = ((dxm == 0) | (dxm == 1) | (dxm == n - 1)) & (
                np.abs(y[didx] - y[qi]) <= 1
            )
            cand = didx[in_ring]
            if len(cand) == 0:
                continue
            dl = lon[qi] - lon[cand]
            dp = lat[qi] - lat[cand]
            d2 = dl * dl + dp * dp
            order = np.lexsort((eid[cand], d2))[: ga.KNN_K]
            for rk, j in enumerate(order, 1):
                exp.append((eid[qi], eid[cand[j]], d2[j], rk))
        got = ga.q_knn_join(SF).to_pandas().sort_values(["qid", "rk"]).reset_index(drop=True)
        exp_df = sorted(exp)
        got_t = sorted(zip(got["qid"], got["nid"], got["d2"], got["rk"]))
        assert got_t == exp_df
        # every query emits at most K rows, ranks dense from 1
        g = got.groupby("qid")["rk"].agg(["min", "max", "count"])
        assert (g["min"] == 1).all() and (g["max"] == g["count"]).all()
        assert (g["count"] <= ga.KNN_K).all()


class TestTilePyramid:
    def test_levels_telescope(self, ray_session):
        """Every level's total equals the point count; each parent tile
        equals the sum of its <=4 children."""
        got = ga.q_tile_pyramid(SF).to_pandas()
        import pyarrow.parquet as pqt

        n_pts = pqt.read_metadata(f"{SF}/events.parquet").num_rows
        for z in range(ga.PYR_Z + 1):
            lvl = got[got["z"] == z]
            assert lvl["n"].sum() == n_pts
            assert lvl["x"].between(0, (1 << z) - 1).all()
            assert lvl["y"].between(0, (1 << z) - 1).all()
        for z in range(1, ga.PYR_Z + 1):
            child = got[got["z"] == z].copy()
            child["px"] = child["x"] // 2
            child["py"] = child["y"] // 2
            rolled = child.groupby(["px", "py"])["n"].sum()
            parent = got[got["z"] == z - 1].set_index(["x", "y"])["n"]
            assert rolled.sort_index().equals(parent.sort_index())
        # level 0 is the single world tile
        assert len(got[got["z"] == 0]) == 1


class TestMortonRangeScan:
    def test_ranges_cover_bbox_exactly(self):
        """Every level-MRS_LEVEL cell key inside the bbox is in exactly
        one range; ranges are sorted, disjoint, non-adjacent."""
        starts, ends = ga._morton_ranges(ga.MRS_BBOX, ga.MRS_LEVEL)
        assert (starts <= ends).all()
        assert (starts[1:] > ends[:-1] + np.uint64(1)).all()  # maximally merged
        from geocoding_ray.state.cells import cell_from_xy, lonlat_to_xy

        minx, miny, maxx, maxy = ga.MRS_BBOX
        x0, y0 = lonlat_to_xy(np.array([minx]), np.array([miny]), ga.MRS_LEVEL)
        x1, y1 = lonlat_to_xy(np.array([maxx]), np.array([maxy]), ga.MRS_LEVEL)
        gx, gy = np.meshgrid(np.arange(x0[0], x1[0] + 1), np.arange(y0[0], y1[0] + 1))
        keys = cell_from_xy(gx.ravel(), gy.ravel(), ga.MRS_LEVEL).astype(np.uint64)
        pos = np.searchsorted(starts, keys, side="right") - 1
        assert (pos >= 0).all() and (keys <= ends[pos]).all()
        # total range mass == number of covered cells (no overshoot)
        assert int((ends - starts + np.uint64(1)).sum()) == len(keys)

    def test_scan_is_level_independent(self, ray_session, monkeypatch):
        """The exact refine makes the result identical at a coarser
        prune level (the index is an optimization, not a semantic)."""
        base = (
            ga.q_morton_range_scan(SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        monkeypatch.setattr(ga, "MRS_LEVEL", 4)
        coarse = (
            ga.q_morton_range_scan(SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert base.equals(coarse)


class TestTrajectory:
    def test_matches_single_node_reference(self, ray_session):
        import pyarrow.parquet as pqt

        from geocoding_ray.pipelines.oracle_queries import _pip_lonlat

        t = pqt.read_table(f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
        eid = t.column("event_id").to_numpy()
        uid = t.column("user_id").to_numpy()
        ts = t.column("ts").to_numpy().view(np.int64)
        exp = {}
        for u in np.unique(uid):
            m = uid == u
            order = np.lexsort((eid[m], ts[m]))
            lon, lat = _pip_lonlat(eid[m][order])
            dl, dp = lon[1:] - lon[:-1], lat[1:] - lat[:-1]
            seg = np.floor(np.sqrt(dl * dl + dp * dp) * ga.TRAJ_SCALE).astype(np.int64)
            exp[int(u)] = (int(m.sum()), int(seg.sum()))
        got = ga.q_trajectory_len(SF).to_pandas()
        assert {int(r.user_id): (int(r.n_pts), int(r.path_int)) for r in got.itertuples()} == exp


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


def test_triangle_count_vs_brute_force(ray_session):
    """Degree-oriented distributed plan vs a dense-matrix reference on
    the same synthesized edge set."""
    import numpy as np
    import pyarrow.parquet as pq

    from geocoding_ray.pipelines.graph_queries import TRI_V, q_triangle_count

    sf = "/root/testdata/sf0.001"
    eid = pq.read_table(f"{sf}/events.parquet", columns=["event_id"]).column(
        "event_id"
    ).to_numpy()
    u = eid % TRI_V
    r = eid % (TRI_V + 1)
    v = (r * r + 7) % (TRI_V + 1) % TRI_V
    A = np.zeros((TRI_V, TRI_V), dtype=np.int64)
    m = u != v
    A[u[m], v[m]] = 1
    A = np.maximum(A, A.T)
    # per-node triangle count = diag(A^3) / 2
    ref = np.diag(A @ A @ A) // 2

    got = q_triangle_count(sf).to_pandas().set_index("node")["n_tri"]
    full = np.zeros(TRI_V, dtype=np.int64)
    full[got.index.to_numpy()] = got.to_numpy()
    assert (full == ref).all()


def test_bfs_hops_vs_reference(ray_session):
    """Iterative frontier relaxation vs a plain queue BFS on the same
    synthesized edge set (connected CRT graph, diameter > 1)."""
    from collections import deque

    import numpy as np
    import pyarrow.parquet as pq

    from geocoding_ray.pipelines.graph_queries import BFS_SOURCE, TRI_V, q_bfs_hops

    sf = "/root/testdata/sf0.001"
    eid = pq.read_table(f"{sf}/events.parquet", columns=["event_id"]).column(
        "event_id"
    ).to_numpy()
    u = eid % TRI_V
    r = eid % (TRI_V + 1)
    v = (r * r + 7) % (TRI_V + 1) % TRI_V
    adj: dict[int, set[int]] = {}
    for a, b in zip(u.tolist(), v.tolist()):
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    ref = {BFS_SOURCE: 0}
    q = deque([BFS_SOURCE])
    while q:
        x = q.popleft()
        for y in adj.get(x, ()):
            if y not in ref:
                ref[y] = ref[x] + 1
                q.append(y)

    got = q_bfs_hops(sf).to_pandas()
    assert dict(zip(got["node"], got["hops"])) == ref
    assert got["hops"].max() > 1  # multi-round traversal actually exercised


def test_sssp_dist_vs_dijkstra(ray_session):
    """Improved-frontier Bellman-Ford vs a plain heap Dijkstra on the
    same weighted edge set; also asserts the oracle's path-enumeration
    cap stays generous (weighted > unit distances somewhere, or the
    operator degenerates to BFS)."""
    import heapq

    import pyarrow.parquet as pq

    from geocoding_ray.pipelines.graph_queries import (
        SSSP_DIST_CAP,
        SSSP_SOURCE,
        SSSP_WMOD,
        TRI_V,
        edge_weight,
        q_sssp_dist,
        tri_edge_nodes,
    )

    sf = "/root/testdata/sf0.001"
    eid = pq.read_table(f"{sf}/events.parquet", columns=["event_id"]).column(
        "event_id"
    ).to_numpy()
    u, v = tri_edge_nodes(eid.astype("int64"))
    adj: dict[int, dict[int, int]] = {}
    for x, y in zip(u.tolist(), v.tolist()):
        if x != y:
            a, b = min(x, y), max(x, y)
            w = int(edge_weight(np.array([a]), np.array([b]))[0])
            adj.setdefault(a, {})[b] = w
            adj.setdefault(b, {})[a] = w
    ref = {SSSP_SOURCE: 0}
    heap = [(0, SSSP_SOURCE)]
    while heap:
        d, x = heapq.heappop(heap)
        if d > ref.get(x, 1 << 30):
            continue
        for y, w in adj.get(x, {}).items():
            nd = d + w
            if nd < ref.get(y, 1 << 30):
                ref[y] = nd
                heapq.heappush(heap, (nd, y))

    got = q_sssp_dist(sf).to_pandas()
    assert dict(zip(got["node"], got["dist"])) == ref
    assert len(got) == TRI_V  # connected: every node reached
    assert got["dist"].max() + SSSP_WMOD < SSSP_DIST_CAP  # oracle cap generous
    # weighted distances genuinely differ from hop counts somewhere
    assert got["dist"].max() > max(1, got["dist"].min() + 1)


def test_connected_components_vs_union_find(ray_session):
    """Min-label propagation over the multiplicity-sparsified graph vs
    a plain union-find on the same thresholded edges."""
    import pyarrow.parquet as pq

    from geocoding_ray.pipelines.graph_queries import (
        CC_MIN_MULT,
        q_connected_components,
        tri_edge_nodes,
    )

    sf = "/root/testdata/sf0.001"
    eid = pq.read_table(f"{sf}/events.parquet", columns=["event_id"]).column(
        "event_id"
    ).to_numpy()
    u, v = tri_edge_nodes(eid.astype("int64"))
    mult: dict[tuple[int, int], int] = {}
    for x, y in zip(u.tolist(), v.tolist()):
        if x != y:
            e = (min(x, y), max(x, y))
            mult[e] = mult.get(e, 0) + 1
    edges = [e for e, m in mult.items() if m >= CC_MIN_MULT]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ref = {n: find(n) for e in edges for n in e}

    got = q_connected_components(sf).to_pandas()
    assert dict(zip(got["node"], got["component"])) == ref
    comps = set(ref.values())
    assert len(comps) > 1  # sparsifier actually fragments the graph
    assert any(sum(1 for x in ref.values() if x == c) > 1 for c in comps)


# ---------------------------------------------------------------------------
# trajectory diameter: hull prune is lossless vs O(n^2) brute force
# ---------------------------------------------------------------------------


def test_hull_diameter_matches_brute_force():
    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(1, 60)
        xs = rng.randint(0, 36000, n).astype(np.int64)
        ys = rng.randint(0, 18000, n).astype(np.int64)
        dx = xs[:, None] - xs[None, :]
        dy = ys[:, None] - ys[None, :]
        want = int((dx * dx + dy * dy).max())
        hx, hy = ga._hull_int(xs, ys)
        hdx = hx[:, None] - hx[None, :]
        hdy = hy[:, None] - hy[None, :]
        assert int((hdx * hdx + hdy * hdy).max()) == want


def test_hull_degenerate_collinear_and_duplicates():
    # all points identical
    hx, hy = ga._hull_int(np.array([5, 5, 5]), np.array([7, 7, 7]))
    assert len(hx) == 1
    # perfectly collinear: hull keeps the two extremes (diameter exact)
    xs = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    ys = xs * 2
    hx, hy = ga._hull_int(xs, ys)
    dx = hx[:, None] - hx[None, :]
    dy = hy[:, None] - hy[None, :]
    assert int((dx * dx + dy * dy).max()) == 16 + 64


# ---------------------------------------------------------------------------
# segment join: cell decomposition + canonical-cell dedup is lossless
# ---------------------------------------------------------------------------


def test_segment_join_cell_plan_matches_brute(ray_session, tmp_path):
    """Write a small synthetic events table, run the full distributed
    plan, and compare against a direct all-pairs orientation count."""
    import pyarrow.parquet as pq

    rng = np.random.RandomState(31)
    n = 400
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(np.arange(n).astype("datetime64[us]")),
            "user_id": pa.array(np.sort(rng.randint(0, 40, n)) * ga.SEGJ_MOD, type=pa.int64()),
            "event_type": pa.array(["x"] * n, type=pa.string()),
            "value": pa.array(np.ones(n), type=pa.float64()),
            "props": pa.array(["{}"] * n, type=pa.string()),
        }
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/events.parquet")
    got = {
        (r["user_a"], r["user_b"]): r["n_crossings"]
        for r in ga.q_segment_join(d).take_all()
    }
    # brute force: all cross-user segment pairs, four-orientation test
    uid = tbl.column("user_id").to_numpy()
    eid = tbl.column("event_id").to_numpy()
    segs = []
    for u in np.unique(uid):
        e = eid[uid == u]
        x = (e * ga.RING_XM) % ga.RING_MOD
        y = (e * ga.RING_YM) % ga.RING_MOD
        for i in range(len(e) - 1):
            segs.append((int(u), int(x[i]), int(y[i]), int(x[i + 1]), int(y[i + 1])))

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    want: dict = {}
    for a in range(len(segs)):
        for b in range(len(segs)):
            ua, ax, ay, bx, by = segs[a]
            ub, cx, cy, dx, dy = segs[b]
            if ua >= ub:
                continue
            p1 = orient(ax, ay, bx, by, cx, cy) * orient(ax, ay, bx, by, dx, dy)
            p2 = orient(cx, cy, dx, dy, ax, ay) * orient(cx, cy, dx, dy, bx, by)
            if p1 < 0 and p2 < 0:
                want[(ua, ub)] = want.get((ua, ub), 0) + 1
    assert got == want


def test_hull_vectorized_stress_large_and_gridded():
    """Round-5: the vectorized QuickHull chain on inputs that stress its
    collinear-tie and multi-round insertion paths — large random clouds,
    a lattice (every boundary edge full of collinear points), and a
    circle-ish ring (many hull vertices)."""
    rng = np.random.RandomState(11)

    def brute(xs, ys):
        dx = xs[:, None] - xs[None, :]
        dy = ys[:, None] - ys[None, :]
        return int((dx * dx + dy * dy).max())

    cases = []
    for n in (500, 2000):
        cases.append((rng.randint(0, 36000, n).astype(np.int64),
                      rng.randint(0, 18000, n).astype(np.int64)))
    gx, gy = np.meshgrid(np.arange(40, dtype=np.int64), np.arange(25, dtype=np.int64))
    cases.append((gx.ravel(), gy.ravel()))
    th = np.linspace(0, 2 * np.pi, 600)
    cases.append((np.round(10000 + 9000 * np.cos(th)).astype(np.int64),
                  np.round(10000 + 9000 * np.sin(th)).astype(np.int64)))
    for xs, ys in cases:
        hx, hy = ga._hull_int(xs, ys)
        hdx = hx[:, None] - hx[None, :]
        hdy = hy[:, None] - hy[None, :]
        assert int((hdx * hdx + hdy * hdy).max()) == brute(xs, ys)
        assert len(hx) < len(xs)  # it actually prunes
