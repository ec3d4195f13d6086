"""Reverse geocoding, cell co-shuffle variant — for an admin-polygon set
too large to broadcast (SURVEY.md §2.5 "shuffle join (both sides
large)", the reverse-side counterpart of ``forward_shuffle``).

Physical plan::

    admin  ──explode──> (cell, polygon cols)   [one row per cell of the
                                                polygon's bbox cover at
                                                CELL_LEVEL]
    points ──encode───> (cell, point cols)     [exactly ONE cell/point]
    union ──groupby(cell)──> map_groups(PIP + deepest-wins per point)

Correctness: a polygon's bbox cover contains every cell its interior
touches, so a point's cell group holds EVERY polygon that can contain
it — the in-group deepest-wins selection (the shared
:func:`stages.reverse.locate_winner` rule) equals the broadcast plan's
global selection, and no second shuffle is needed (each point lives in
exactly one group).

Scale notes:

* replication factor = mean bbox-cover size at ``cell_level`` — pick
  the level so typical polygons cover O(1..100) cells; country-scale
  outliers replicate more but are few (the classic geo big-join
  trade-off; a two-level scheme would cap it);
* skew = points per cell; cells are equal-area in lon/lat so hot cells
  come from data density.  Polygon rows are replicated per cell anyway,
  so a hot CELL can be split further by salting the POINT side and
  replicating that cell's polygons per salt — structurally identical to
  ``forward_shuffle``'s hot-token salting and omitted here because the
  per-cell polygon count (not point count) bounds the group's PIP cost;
* group cost: one PackedRings + STR-tree build per (cell) group over
  only that cell's polygons, then the vectorized winner selection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state import cells
from ..state.geometry import PackedRings
from ..state.rtree import STRtree
from ..stages.reverse import locate_winner

# columns the group matcher needs; bbox cols are consumed by the explode
# and pruned before the shuffle
_ADMIN_COLS = ("admin_id", "level_rank", "area", "formatted", "rings")


def bbox_cover_rows(
    minx: np.ndarray,
    miny: np.ndarray,
    maxx: np.ndarray,
    maxy: np.ndarray,
    cell_level: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bbox -> covering-cell expansion shared by the cell
    co-shuffle joins (reverse PIP and the radius range join).

    Returns ``(row_idx, cell)`` — parallel arrays where ``row_idx[i]``
    is the source-row index whose bbox covers ``cell[i]``; each
    (row, cell) pair appears exactly once.

    Antimeridian: a bbox with ``minx > maxx`` (Fiji-style wrap) splits
    into two lon spans — [minx, 180] and [-180, maxx] — before the
    count arithmetic, so the uint64 column math never underflows."""
    n = len(minx)
    x0, y0 = cells.lonlat_to_xy(minx, miny, cell_level)
    x1, y1 = cells.lonlat_to_xy(maxx, maxy, cell_level)
    x0 = x0.astype(np.int64)
    x1 = x1.astype(np.int64)
    y0 = y0.astype(np.int64)
    y1 = y1.astype(np.int64)
    nmax = (1 << cell_level) - 1
    # wrap is a LON-space property (minx > maxx), not a cell-space one:
    # a wrap bbox whose two edges quantize into the same cell column
    # still spans every other column, so testing x1 < x0 would drop
    # most of the cover
    wrap = minx > maxx
    if wrap.any():
        w = np.nonzero(wrap)[0]
        # segment 1 (original rows): [x0, nmax]; segment 2 (appended
        # pseudo-rows): [0, x1].  When both lon edges quantize into the
        # SAME column (x1 == x0, possible at coarse levels), segment 1
        # already covers that column — shrink segment 2 to [0, x1-1]
        # and drop it entirely at x1 == 0 (round-3 advice: the
        # deepest-wins tie-break made the duplicate (cell, polygon)
        # rows benign, but replication was silently inflated).
        w_hi = np.where(x1[w] == x0[w], x1[w] - 1, x1[w])
        keep = w_hi >= 0
        w, w_hi = w[keep], w_hi[keep]
        seg_row = np.concatenate([np.arange(n, dtype=np.int64), w])
        seg_x0 = np.concatenate([x0, np.zeros(len(w), dtype=np.int64)])
        seg_x1 = np.concatenate([np.where(wrap, nmax, x1), w_hi])
        seg_y0 = np.concatenate([y0, y0[w]])
        seg_y1 = np.concatenate([y1, y1[w]])
    else:
        seg_row = np.arange(n, dtype=np.int64)
        seg_x0, seg_x1, seg_y0, seg_y1 = x0, x1, y0, y1
    nx = seg_x1 - seg_x0 + 1
    ny = seg_y1 - seg_y0 + 1
    cnt = nx * ny
    total = int(cnt.sum())
    rep = np.repeat(np.arange(len(seg_row), dtype=np.int64), cnt)
    within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    dx = within % nx[rep]
    dy = within // nx[rep]
    cell = cells.cell_from_xy(seg_x0[rep] + dx, seg_y0[rep] + dy, cell_level)
    return seg_row[rep], cell


def explode_admin_cells(batch: pa.Table, cell_level: int) -> pa.Table:
    """Admin rows -> one row per covering cell of the polygon bbox at
    ``cell_level`` (fully vectorized via :func:`bbox_cover_rows`)."""
    row_idx, cell = bbox_cover_rows(
        batch.column("minx").to_numpy(zero_copy_only=False),
        batch.column("miny").to_numpy(zero_copy_only=False),
        batch.column("maxx").to_numpy(zero_copy_only=False),
        batch.column("maxy").to_numpy(zero_copy_only=False),
        cell_level,
    )
    out = batch.select(list(_ADMIN_COLS)).take(pa.array(row_idx, type=pa.int64()))
    return out.append_column("cell", pa.array(cell.view(np.int64), type=pa.int64()))



def key_points(batch: pa.Table, cell_level: int, id_col: str) -> pa.Table:
    """Point rows -> (cell, id, lon, lat); exactly one cell per point."""
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    cell = cells.encode(lon, lat, cell_level)
    return pa.table(
        {
            "cell": pa.array(cell.view(np.int64), type=pa.int64()),
            id_col: batch.column(id_col),
            "lon": batch.column("lon"),
            "lat": batch.column("lat"),
        }
    )


def make_cell_matcher(id_col: str, id_type: pa.DataType):
    """Per-cell group: exact PIP + deepest-wins over the group's
    polygons; every point emits exactly one row (miss -> admin_id 0,
    null formatted — the broadcast ReverseJoiner's contract)."""

    def match_cell(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        qmask = pc.equal(g.column("side"), "q")
        qs = g.filter(qmask)
        ps = g.filter(pc.invert(qmask))
        nq = qs.num_rows
        if nq == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=id_type),
                    "admin_id": pa.array([], type=pa.int64()),
                    "formatted": pa.array([], type=pa.string()),
                    "match_kind": pa.array([], type=pa.string()),
                }
            )
        lon = qs.column("lon").to_numpy(zero_copy_only=False)
        lat = qs.column("lat").to_numpy(zero_copy_only=False)
        if ps.num_rows == 0:
            win = np.full(nq, -1, dtype=np.int64)
        else:
            rings = PackedRings.from_arrow(ps.column("rings"))
            tree = STRtree(rings.bbox)
            win = locate_winner(
                rings,
                tree,
                ps.column("level_rank").to_numpy(zero_copy_only=False).astype(np.int32),
                ps.column("area").to_numpy(zero_copy_only=False),
                ps.column("admin_id").to_numpy(zero_copy_only=False).astype(np.uint64),
                lon,
                lat,
            )
        hit = win >= 0
        admin_id = np.zeros(nq, dtype=np.int64)
        formatted = np.full(nq, None, dtype=object)
        if hit.any():
            aid = ps.column("admin_id").to_numpy(zero_copy_only=False).astype(np.int64)
            fmt = np.array(ps.column("formatted").to_pylist(), dtype=object)
            admin_id[hit] = aid[win[hit]]
            formatted[hit] = fmt[win[hit]]
        return pa.table(
            {
                id_col: qs.column(id_col),
                "admin_id": pa.array(admin_id, type=pa.int64()),
                "formatted": pa.array(formatted.tolist(), type=pa.string()),
                "match_kind": pa.array(np.where(hit, "pip", "miss").tolist(), type=pa.string()),
            }
        )

    return match_cell


def run_reverse_shuffle(points_ds, admin_side, cell_level: int = 4, id_col: str = "event_id"):
    """Cell co-shuffle reverse join.

    ``points_ds``: Dataset with (id_col, lon, lat).  ``admin_side``: the
    admin table — a driver-side ``pa.Table`` for a small world, or a
    ``ray.data.Dataset`` when the polygon set is itself too large to
    hold anywhere (the true both-sides-large shape: the explode then
    runs as a distributed ``map_batches`` stage).  Returns per-point
    rows (id, admin_id, formatted, match_kind) — the broadcast plan's
    schema.
    """
    import ray.data as rd

    id_type = None
    for name, typ in zip(points_ds.schema().names, points_ds.schema().types):
        if name == id_col:
            id_type = typ
    if id_type is None:
        raise ValueError(f"points dataset lacks id column {id_col!r}")

    if isinstance(admin_side, pa.Table):
        admin_cells = explode_admin_cells(admin_side, cell_level)
        admin_schema = admin_cells.schema
        gaz_raw = rd.from_arrow(admin_cells)
    else:
        gaz_raw = admin_side.map_batches(
            lambda b: explode_admin_cells(b, cell_level), batch_format="pyarrow"
        )
        # resolve column types on the DRIVER (never .schema() inside a
        # closure); explode preserves the source admin column types
        src = admin_side.schema()
        admin_schema = pa.schema(
            [pa.field(n, t) for n, t in zip(src.names, src.types) if n in _ADMIN_COLS]
            + [pa.field("cell", pa.int64())]
        )

    def tag_admin(b: pa.Table) -> pa.Table:
        b = b.append_column("side", pa.array(["g"] * b.num_rows, type=pa.string()))
        b = b.append_column(id_col, pa.nulls(b.num_rows, type=id_type))
        b = b.append_column("lon", pa.nulls(b.num_rows, type=pa.float64()))
        return b.append_column("lat", pa.nulls(b.num_rows, type=pa.float64()))

    admin_types = {c: admin_schema.field(c).type for c in _ADMIN_COLS}

    def tag_points(b: pa.Table) -> pa.Table:
        b = b.append_column("side", pa.array(["q"] * b.num_rows, type=pa.string()))
        for c in _ADMIN_COLS:
            b = b.append_column(c, pa.nulls(b.num_rows, type=admin_types[c]))
        return b

    cols = ["cell", "side", id_col, "lon", "lat"] + list(_ADMIN_COLS)
    gaz_side = gaz_raw.map_batches(tag_admin, batch_format="pyarrow").select_columns(cols)
    pt_side = (
        points_ds.map_batches(lambda b: key_points(b, cell_level, id_col), batch_format="pyarrow")
        .map_batches(tag_points, batch_format="pyarrow")
        .select_columns(cols)
    )
    both = gaz_side.union(pt_side)
    return both.groupby("cell").map_groups(make_cell_matcher(id_col, id_type), batch_format="pyarrow")
