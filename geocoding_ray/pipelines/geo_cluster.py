"""Spatial clustering & coverage operators (round-4 batch 6):

* ``dbscan_grid`` — grid-density DBSCAN: per-cell counts, MINPTS core
  threshold, connected components over 8-adjacent core cells (lon
  wraps, lat clamps).  Gated: the DuckDB oracle reproduces the label
  propagation with a recursive CTE.
* ``cell_compact`` — quadtree cell compaction (H3/S2 ``compact_cells``
  semantics): a parent replaces its 4 children iff all 4 are occupied,
  applied bottom-up for a fixed number of levels.  Gated: chained
  anti-join CTEs per level.
* ``traj_simplify`` — Douglas-Peucker polyline simplification per
  user trajectory, exact integer cross-product distances.  Rows-only
  (the recursion is not SQL-expressible); the DP deviation guarantee
  is property-tested instead.

Scale shapes (DESIGN.md "Spatial analytics" recipes):

* dbscan_grid reduces the point stream to grid-bounded per-cell
  partials in ONE pass; everything after — the core filter, the 9x
  neighbor emit, the label-propagation joins — is bounded by the GRID
  (≤ 4^level rows), never the data.  Cluster labels come from the
  fully distributed :func:`geocoding_ray.stages.dedup.connected_components`
  (per-round hash join + min-groupby of slim rows; the driver holds
  only the convergence checksum).
* cell_compact's working set is the distinct-cell set, again grid-
  bounded; each level is one groupby(parent).map_groups of ≤4-row
  groups.
* traj_simplify is a single user-keyed shuffle; per-group DP work is
  bounded by that user's trajectory length and each segment scan is a
  vectorized numpy cross-product pass.

The reference has no clustering/compaction surface (it is a
row-at-a-time HTTP client, `lib.rs:41-51`); these extend the engine's
geo-analytics family per the north rule's "H3/S2 index, point-in-
polygon, kNN, raster<->vector" charter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# dbscan_grid
# ---------------------------------------------------------------------------
#
# Deterministic blob field: 5 well-separated Gaussian-ish blobs (±4°
# uniform lattice jitter around centers 60°/30° apart) so the cluster
# structure is scale-invariant — more rows densify the same blobs
# instead of percolating the whole grid into one component.

DB_LEVEL = 6
_DN = 1 << DB_LEVEL  # 64 x 64 grid
DB_MINPTS = 5


def _blob_lonlat(eid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    k = (eid % 5).astype(np.float64)
    lon = -150.0 + 60.0 * k + ((eid * 48271) % 800) / 100.0 - 4.0
    lat = -60.0 + 30.0 * k + ((eid * 16807) % 800) / 100.0 - 4.0
    return lon, lat


_BLOB_SQL = """
  SELECT -150.0 + 60.0 * (event_id % 5) + ((event_id * 48271) % 800) / 100.0 - 4.0 AS lon,
         -60.0 + 30.0 * (event_id % 5) + ((event_id * 16807) % 800) / 100.0 - 4.0 AS lat
  FROM events
"""


def _db_partials(batch: pa.Table) -> pa.Table:
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    lon, lat = _blob_lonlat(eid)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * _DN).astype(np.int64), 0, _DN - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * _DN).astype(np.int64), 0, _DN - 1)
    key, cnt = np.unique(x * _DN + y, return_counts=True)
    return pa.table(
        {
            "x": pa.array(key // _DN, type=pa.int64()),
            "y": pa.array(key % _DN, type=pa.int64()),
            "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
        }
    )


def _core_filter(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    t = batch.filter(pc.greater_equal(batch.column("n"), DB_MINPTS))
    k = t.column("x").to_numpy(zero_copy_only=False) * _DN + t.column("y").to_numpy(
        zero_copy_only=False
    )
    return t.append_column("k", pa.array(k, type=pa.int64()))


def _emit_ring(batch: pa.Table) -> pa.Table:
    """Each core cell emits its 3x3 ring positions (incl. itself, so
    isolated core cells still reach the component pass as singletons);
    x wraps around the antimeridian, y clamps at the poles."""
    x = batch.column("x").to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False)
    k = batch.column("k").to_numpy(zero_copy_only=False)
    dx, dy = np.meshgrid(np.arange(-1, 2), np.arange(-1, 2))
    dx, dy = dx.ravel(), dy.ravel()
    rx = (x[:, None] + dx[None, :] + _DN) % _DN
    ry = y[:, None] + dy[None, :]
    kk = np.broadcast_to(k[:, None], rx.shape)
    keep = (ry >= 0) & (ry < _DN)
    return pa.table(
        {
            "x": pa.array(rx[keep], type=pa.int64()),
            "y": pa.array(ry[keep], type=pa.int64()),
            "a": pa.array(kk[keep], type=pa.int64()),
        }
    )


def q_dbscan_grid(sf_dir: str):
    """Grid-density DBSCAN over the blob field: core cells (n >= 5 at
    level 6) clustered by 8-adjacency connected components; cluster id
    = min packed cell key of the component."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from geocoding_ray.stages.dedup import connected_components

    from .olap_queries import _scrub_empties

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    core = (
        ds.map_batches(_db_partials, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum(on="n", alias_name="n"))
        .map_batches(_core_filter, batch_format="pyarrow")
    )
    core = _scrub_empties(core, 4).materialize()  # grid-bounded working set

    # edge (a, b) exists iff BOTH endpoints are core: the ring emit is a
    # bounded 9x fan-out of CELL rows, the inner join keeps core-core
    # adjacency only.  Self-pairs (the (0,0) offset) keep isolated core
    # cells alive as singleton components.
    ring = core.map_batches(_emit_ring, batch_format="pyarrow")
    pairs = ring.join(
        core.map_batches(
            lambda b: b.select(["x", "y", "k"]).rename_columns(["x", "y", "b"]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        on=("x", "y"),
        num_partitions=4,
    ).map_batches(lambda b: b.select(["a", "b"]), batch_format="pyarrow")

    labels = connected_components(pairs, max_rounds=12, num_partitions=4)

    out = core.join(
        _scrub_empties(
            labels.map_batches(
                lambda b: b.rename_columns(["k", "cluster"]), batch_format="pyarrow"
            ),
            4,
        ),
        join_type="inner",
        on=("k",),
        num_partitions=4,
    )
    return out.map_batches(
        lambda b: b.select(["x", "y", "n", "cluster"]), batch_format="pyarrow"
    )


SQL_DBSCAN_GRID = f"""
WITH RECURSIVE pts AS ({_BLOB_SQL}),
xy AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_DN}) AS BIGINT), 0), {_DN - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {_DN}) AS BIGINT), 0), {_DN - 1}) AS y
  FROM pts),
core AS (
  SELECT x, y, COUNT(*) AS n, x * {_DN} + y AS k
  FROM xy GROUP BY x, y HAVING COUNT(*) >= {DB_MINPTS}),
offs AS (SELECT dx, dy FROM (VALUES (-1), (0), (1)) a(dx), (VALUES (-1), (0), (1)) b(dy)),
edges AS (
  SELECT c.k AS k1, d.k AS k2
  FROM core c JOIN offs o ON TRUE
  JOIN core d ON d.x = (c.x + o.dx + {_DN}) % {_DN} AND d.y = c.y + o.dy),
reach(k, lab) AS (
  SELECT k, k FROM core
  UNION
  SELECT e.k2, r.lab FROM reach r JOIN edges e ON e.k1 = r.k)
SELECT c.x, c.y, c.n, m.cluster
FROM core c
JOIN (SELECT k, MIN(lab) AS cluster FROM reach GROUP BY k) m ON m.k = c.k
"""


# ---------------------------------------------------------------------------
# cell_compact
# ---------------------------------------------------------------------------

CMP_BASE = 6  # leaf level (64 x 64)
CMP_TOP = 3  # compact at most down to this level


def _cmp_cells(batch: pa.Table) -> pa.Table:
    """events -> distinct leaf cells of the uniform _pip_lonlat field."""
    from .oracle_queries import _pip_lonlat

    n = 1 << CMP_BASE
    eid = batch.column("event_id").to_numpy(zero_copy_only=False)
    lon, lat = _pip_lonlat(eid)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    key = np.unique(x * n + y)
    return pa.table(
        {
            "x": pa.array(key // n, type=pa.int64()),
            "y": pa.array(key % n, type=pa.int64()),
        }
    )


def _compact_one_level(level: int):
    """groupby(parent).map_groups body: a complete 4-child group
    collapses to its parent (final=0, promoted to the next round); an
    incomplete group keeps its children as final output rows."""

    def fn(group: pa.Table) -> pa.Table:
        if group.num_rows == 4:
            return pa.table(
                {
                    "level": pa.array([level - 1], type=pa.int64()),
                    "x": group.column("px").slice(0, 1),
                    "y": group.column("py").slice(0, 1),
                    "final": pa.array([0], type=pa.int64()),
                }
            )
        nr = group.num_rows
        return pa.table(
            {
                "level": pa.array(np.full(nr, level, dtype=np.int64)),
                "x": group.column("x"),
                "y": group.column("y"),
                "final": pa.array(np.ones(nr, dtype=np.int64)),
            }
        )

    return fn


def _tag_parent(batch: pa.Table) -> pa.Table:
    x = batch.column("x").to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "x": batch.column("x"),
            "y": batch.column("y"),
            "px": pa.array(x // 2, type=pa.int64()),
            "py": pa.array(y // 2, type=pa.int64()),
        }
    )


def q_cell_compact(sf_dir: str):
    """Quadtree compaction of the occupied leaf-cell set: (level, x, y)
    rows whose union of footprints exactly equals the leaf set, with
    every complete 4-child family replaced by its parent, bottom-up
    from level 6 to level 3."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .olap_queries import _scrub_empties

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])
    frontier = (
        ds.map_batches(_cmp_cells, batch_format="pyarrow")
        .groupby(["x", "y"])
        .count()
        .map_batches(lambda b: b.select(["x", "y"]), batch_format="pyarrow")
    )

    finals = []
    for level in range(CMP_BASE, CMP_TOP, -1):
        stepped = (
            _scrub_empties(frontier, 4)
            .map_batches(_tag_parent, batch_format="pyarrow")
            .groupby(["px", "py"])
            .map_groups(_compact_one_level(level), batch_format="pyarrow")
            .materialize()  # grid-bounded (<= 4^level rows)
        )
        finals.append(
            stepped.map_batches(
                lambda b: b.filter(pc.equal(b.column("final"), 1)).select(
                    ["level", "x", "y"]
                ),
                batch_format="pyarrow",
            )
        )
        frontier = stepped.map_batches(
            lambda b: b.filter(pc.equal(b.column("final"), 0)).select(["x", "y"]),
            batch_format="pyarrow",
        )

    top = frontier.map_batches(
        lambda b: pa.table(
            {
                "level": pa.array(np.full(b.num_rows, CMP_TOP, dtype=np.int64)),
                "x": b.column("x"),
                "y": b.column("y"),
            }
        ),
        batch_format="pyarrow",
    )
    out = finals[0]
    for f in finals[1:]:
        out = out.union(f)
    return out.union(top)


def _sql_cell_compact() -> str:
    n = 1 << CMP_BASE
    lines = [
        "WITH pts AS (",
        "  SELECT ((event_id * 48271) % 36000) / 100.0 - 180.0 + 0.005 AS lon,",
        "         ((event_id * 16807) % 18000) / 100.0 - 90.0 + 0.005 AS lat",
        "  FROM events),",
        "c6 AS (",
        f"  SELECT DISTINCT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) AS x,",
        f"         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}) AS y",
        "  FROM pts),",
    ]
    for lvl in range(CMP_BASE, CMP_TOP, -1):
        p = lvl - 1
        lines += [
            f"p{p} AS (",
            f"  SELECT x // 2 AS x, y // 2 AS y FROM c{lvl} GROUP BY 1, 2 HAVING COUNT(*) = 4),",
            f"k{lvl} AS (",
            f"  SELECT CAST({lvl} AS BIGINT) AS level, c.x, c.y FROM c{lvl} c",
            f"  LEFT JOIN p{p} p ON c.x // 2 = p.x AND c.y // 2 = p.y WHERE p.x IS NULL),",
            f"c{p} AS (SELECT x, y FROM p{p}),",
        ]
    parts = [f"SELECT * FROM k{lvl}" for lvl in range(CMP_BASE, CMP_TOP, -1)]
    parts.append(f"SELECT CAST({CMP_TOP} AS BIGINT) AS level, x, y FROM c{CMP_TOP}")
    body = "\nUNION ALL\n".join(parts)
    return "\n".join(lines)[:-1] + "\n" + body


SQL_CELL_COMPACT = _sql_cell_compact()


# ---------------------------------------------------------------------------
# traj_simplify (Douglas-Peucker)
# ---------------------------------------------------------------------------

TRAJ_EPS = 2000  # integer tolerance, units of 0.01 degrees (= 20 deg)


def _dp_keep(ix: np.ndarray, iy: np.ndarray, eps: int) -> np.ndarray:
    """Iterative Douglas-Peucker over integer coordinates; returns the
    boolean keep mask.  All distance tests are exact int64 cross-
    product comparisons (|cross| <= 1.3e9 so cross^2 <= 1.7e18 and
    eps^2 * d2 <= 6.5e15 both fit); the per-segment farthest-point scan
    is a vectorized numpy pass."""
    m = len(ix)
    keep = np.zeros(m, dtype=bool)
    keep[0] = keep[-1] = True
    eps2 = np.int64(eps) * np.int64(eps)
    stack = [(0, m - 1)]
    while stack:
        i, j = stack.pop()
        if j - i < 2:
            continue
        x1, y1, x2, y2 = ix[i], iy[i], ix[j], iy[j]
        sx, sy = ix[i + 1 : j], iy[i + 1 : j]
        dx, dy = x2 - x1, y2 - y1
        d2 = dx * dx + dy * dy
        if d2 == 0:
            # degenerate closed segment: plain point distance to anchor
            dev = (sx - x1) ** 2 + (sy - y1) ** 2
            thr = eps2
        else:
            cross = dx * (sy - y1) - dy * (sx - x1)
            dev = cross * cross
            thr = eps2 * d2
        a = int(np.argmax(dev))
        if dev[a] > thr:
            split = i + 1 + a
            keep[split] = True
            stack.append((i, split))
            stack.append((split, j))
    return keep


def _traj_simplify_group(group: pa.Table) -> pa.Table:
    ts = group.column("ts").to_numpy(zero_copy_only=False)
    eid = group.column("event_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, ts))
    eid = eid[order]
    ix = (eid * 48271) % 36000
    iy = (eid * 16807) % 18000
    if len(eid) < 3:
        kept = len(eid)
        kept_mask = np.ones(len(eid), dtype=bool)
    else:
        kept_mask = _dp_keep(ix, iy, TRAJ_EPS)
        kept = int(kept_mask.sum())
    # order-position checksum so tests can gate determinism of WHICH
    # points survive, not just how many
    pos = np.nonzero(kept_mask)[0].astype(np.int64)
    chk = int(((pos + 1) * (pos + 7)).sum() % 1_000_000_007)
    return pa.table(
        {
            "user_id": group.column("user_id").slice(0, 1),
            "n_points": pa.array([len(eid)], type=pa.int64()),
            "n_kept": pa.array([kept], type=pa.int64()),
            "kept_checksum": pa.array([chk], type=pa.int64()),
        }
    )


def q_traj_simplify(sf_dir: str):
    """Per-user Douglas-Peucker trajectory simplification (eps = 20deg
    over the deterministic integer point lattice).  One user-keyed
    shuffle; per-group work bounded by trajectory length.  Rows-only:
    the DP recursion isn't SQL-expressible — the deviation guarantee
    (every dropped point within eps of its covering kept segment) is
    property-tested in tests/test_geo_cluster.py instead."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )
    return ds.groupby("user_id").map_groups(
        _traj_simplify_group, batch_format="pyarrow"
    )
