"""Reverse geocoding: broadcast spatial join (SURVEY.md O1/O3/O9/O12).

Design (SURVEY.md §2.5): the admin-polygon table is the *small* side —
built once on the driver into an immutable :class:`AdminIndex`
(packed rings + STR R-tree + component arrays), put into the Ray object
store with ``ray.put``, and fetched by every :class:`ReverseJoiner`
actor in ``__init__`` (once per actor, the engine analogue of the
reference's once-per-instance client build, opencage.rs:118-123).
Points never shuffle; the index never re-ships per batch.

Semantics reproduced:

* deepest (most specific) admin polygon wins; ties -> smaller area, then
  lower admin_id — a total order, so output is deterministic under any
  batch split (SURVEY.md §7 hard part 3);
* PIP miss -> kNN fallback to nearest place centroid within
  ``tolerance_m`` (GeoAdmin identify ``tolerance=50``,
  geoadmin.rs:273-291), tie-break (distance, place_id);
* still nothing -> null formatted (GeoAdmin ``Ok(None)``,
  geoadmin.rs:295-304); with ``strict_nonempty`` the row is flagged in an
  ``error`` column instead of panicking the task (OpenCage/OSM index
  ``results[0]`` and would panic, opencage.rs:370-372).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..config import ReverseConfig
from ..functions.formatters import geoadmin_reverse_label, osm_display_name
from ..sources.schemas import COMPONENT_FIELDS, COMPONENT_LANG_FIELDS
from ..state import cells
from ..state.distance import haversine_m
from ..state.geometry import PackedRings
from ..state.rtree import STRtree

_KNN_CELL_LEVEL = 10  # ~39 km lon cells at equator; disk radius 1 covers ~39 km reach


def locate_winner(
    rings: PackedRings,
    tree: STRtree,
    level_rank: np.ndarray,
    area: np.ndarray,
    admin_id: np.ndarray,
    lon: np.ndarray,
    lat: np.ndarray,
) -> np.ndarray:
    """Per point: index of the winning containing polygon, or -1.

    Winner = max level_rank, then min area, then min admin_id — the
    deepest-wins total order (SURVEY.md §7 hard part 3).  Shared by the
    broadcast :class:`AdminIndex` and the cell co-shuffle group matcher
    (``pipelines/reverse_shuffle.py``), so both physical plans apply the
    identical rule.
    """
    n = len(lon)
    win = np.full(n, -1, dtype=np.int64)
    if n == 0 or rings.n_polys == 0:
        return win
    p_idx, a_idx = tree.query_points(lon, lat)
    if len(p_idx) == 0:
        return win
    # verify candidates with exact PIP, grouped by polygon for
    # vectorized ring tests
    hit_p: list[np.ndarray] = []
    hit_a: list[np.ndarray] = []
    order = np.argsort(a_idx, kind="stable")
    a_sorted = a_idx[order]
    p_sorted = p_idx[order]
    bounds = np.searchsorted(a_sorted, np.unique(a_sorted), side="left")
    uniq = np.unique(a_sorted)
    bounds = np.append(bounds, len(a_sorted))
    for k, poly in enumerate(uniq):
        pts = p_sorted[bounds[k] : bounds[k + 1]]
        inside = rings.contains(int(poly), lon[pts], lat[pts])
        if inside.any():
            hit_p.append(pts[inside])
            hit_a.append(np.full(int(inside.sum()), poly, dtype=np.int64))
    if not hit_p:
        return win
    hp = np.concatenate(hit_p)
    ha = np.concatenate(hit_a)
    # total order: (-level_rank, area, admin_id) ascending per point
    key_rank = -level_rank[ha].astype(np.int64)
    key_area = area[ha]
    key_id = admin_id[ha].astype(np.int64)
    sel = np.lexsort((key_id, key_area, key_rank, hp))
    hp_s = hp[sel]
    ha_s = ha[sel]
    first = np.ones(len(hp_s), dtype=bool)
    first[1:] = hp_s[1:] != hp_s[:-1]
    win[hp_s[first]] = ha_s[first]
    return win


class AdminIndex:
    """Immutable reverse-join build side: polygons + places.

    Built driver-side from the admin_boundaries and gazetteer Arrow
    tables; pickles compactly (numpy arrays + python lists of strings).
    """

    def __init__(self, admin_tbl: pa.Table, gazetteer_tbl: Optional[pa.Table] = None):
        self.admin_id = admin_tbl.column("admin_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        self.level_rank = admin_tbl.column("level_rank").to_numpy(zero_copy_only=False).astype(np.int32)
        self.area = admin_tbl.column("area").to_numpy(zero_copy_only=False)
        self.formatted = np.array(admin_tbl.column("formatted").to_pylist(), dtype=object)
        self.name = admin_tbl.column("name").to_pylist()
        self.components = {
            f: np.array(admin_tbl.column(f).to_pylist(), dtype=object)
            for f in COMPONENT_FIELDS + COMPONENT_LANG_FIELDS
        }
        # Pre-rendered per-provider strings (byte-stable, SURVEY.md §7 hard
        # part 2): osm display_name over the component hierarchy.
        self.osm_formatted = np.array(
            [
                osm_display_name({f: self.components[f][a] for f in COMPONENT_FIELDS})
                for a in range(len(self.admin_id))
            ],
            dtype=object,
        )
        self.rings = PackedRings.from_arrow(admin_tbl.column("rings"))
        self.tree = STRtree(self.rings.bbox)

        # kNN side: place centroids bucketed by cell for ring expansion
        if gazetteer_tbl is not None:
            self.place_id = gazetteer_tbl.column("place_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            self.place_lon = gazetteer_tbl.column("lon").to_numpy(zero_copy_only=False)
            self.place_lat = gazetteer_tbl.column("lat").to_numpy(zero_copy_only=False)
            self.place_label = np.array(gazetteer_tbl.column("label").to_pylist(), dtype=object)
            strname = gazetteer_tbl.column("strname_deinr").to_pylist()
            dplz4 = gazetteer_tbl.column("dplz4").to_pylist()
            dplzname = gazetteer_tbl.column("dplzname").to_pylist()
            self.place_geoadmin_label = np.array(
                [geoadmin_reverse_label(s, z, zn) for s, z, zn in zip(strname, dplz4, dplzname)],
                dtype=object,
            )
            pcell = cells.encode(self.place_lon, self.place_lat, _KNN_CELL_LEVEL)
            order = np.argsort(pcell, kind="stable")
            self._pcell_sorted = pcell[order]
            self._porder = order
        else:
            self.place_id = np.zeros(0, dtype=np.uint64)
            self.place_lon = np.zeros(0)
            self.place_lat = np.zeros(0)
            self.place_label = np.zeros(0, dtype=object)
            self.place_geoadmin_label = np.zeros(0, dtype=object)
            self._pcell_sorted = np.zeros(0, dtype=np.uint64)
            self._porder = np.zeros(0, dtype=np.int64)

    def render_all(self, provider, language: Optional[str]) -> np.ndarray:
        """Per-polygon formatted strings for an arbitrary
        (provider, language) — the generic-path analogue of the
        pre-rendered ``formatted`` / ``osm_formatted`` arrays.

        Cost is O(#polygons), i.e. the small broadcast side, never the
        data rows; callers render once per actor and gather per batch
        (round-3 VERDICT Next #4: language variants and registered
        providers previously paid a per-data-row Python render).
        """
        out = np.empty(len(self.admin_id), dtype=object)
        for a in range(len(self.admin_id)):
            comps = {f: self.components[f][a] for f in COMPONENT_FIELDS}
            comps.update(
                {f.replace("_fr", ":fr"): self.components[f][a] for f in COMPONENT_LANG_FIELDS}
            )
            out[a] = provider.render_reverse(comps, language)
        return out

    # ---- point-in-polygon with deepest-wins selection -------------------

    def locate(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """Per point: index of the winning polygon, or -1.

        Winner = max level_rank, then min area, then min admin_id.
        """
        return locate_winner(
            self.rings, self.tree, self.level_rank, self.area, self.admin_id, lon, lat
        )

    # ---- kNN fallback ----------------------------------------------------

    def nearest_place(self, lon: np.ndarray, lat: np.ndarray, tolerance_m: float) -> tuple[np.ndarray, np.ndarray]:
        """Per point: (place array index or -1, distance m).

        Cell-ring candidate gathering (disk radius 1 at level 10) then
        exact haversine; deterministic tie-break (distance, place_id).

        Search reach is bounded by the cell disk (~39 km of longitude at
        the equator): a ``tolerance_m`` beyond that cannot match — by
        design, mirroring GeoAdmin's identify which is a *local* probe
        (``tolerance`` in screen px around the point, geoadmin.rs:287),
        not a global nearest-neighbor query.
        """
        n = len(lon)
        out_idx = np.full(n, -1, dtype=np.int64)
        out_d = np.full(n, np.inf)
        if n == 0 or len(self.place_id) == 0:
            return out_idx, out_d
        qcell = cells.encode(lon, lat, _KNN_CELL_LEVEL)
        disks = cells.neighbors_disk(qcell, radius=1)  # (n, 9)

        # Fully vectorized candidate gathering: searchsorted over all
        # (point, disk-cell) pairs at once, then one flat haversine and a
        # segment-min with deterministic (distance, place_id) tie-break.
        flat_cells = disks.ravel()
        lo = np.searchsorted(self._pcell_sorted, flat_cells, side="left")
        hi = np.searchsorted(self._pcell_sorted, flat_cells, side="right")
        counts = (hi - lo).reshape(n, -1)  # candidates per (point, cell)
        per_point = counts.sum(axis=1)
        total = int(per_point.sum())
        if total == 0:
            return out_idx, out_d
        # expand ranges [lo, hi) into flat indices into _porder
        seg_len = (hi - lo).astype(np.int64)
        nz = seg_len > 0
        starts = lo[nz]
        lens = seg_len[nz]
        offs = np.concatenate([[0], np.cumsum(lens)])
        flat = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], lens) + np.repeat(starts, lens)
        cand = self._porder[flat]
        # owning point of each candidate (disk cells are row-major per point)
        point_of = np.repeat(np.repeat(np.arange(n), disks.shape[1])[nz], lens)
        d = haversine_m(lon[point_of], lat[point_of], self.place_lon[cand], self.place_lat[cand])
        # disk cells can overlap after lon wrap/clamp -> duplicates are
        # harmless (same distance, same id; min picks one value)
        order = np.lexsort((self.place_id[cand], d, point_of))
        p_s = point_of[order]
        first = np.ones(len(p_s), dtype=bool)
        first[1:] = p_s[1:] != p_s[:-1]
        win_rows = p_s[first]
        win_cand = cand[order][first]
        win_d = d[order][first]
        ok = win_d <= tolerance_m
        out_idx[win_rows[ok]] = win_cand[ok]
        out_d[win_rows[ok]] = win_d[ok]
        return out_idx, out_d


class ReverseJoiner:
    """Actor-pool ``map_batches`` stage: (lon, lat) -> reverse result.

    ``__init__`` fetches the broadcast AdminIndex once per actor;
    ``__call__`` is pure per-batch compute (no driver round-trips).
    """

    def __init__(self, index_ref, config: ReverseConfig = ReverseConfig(), provider=None):
        import ray

        from ..providers import get_provider

        self.index: AdminIndex = ray.get(index_ref) if not isinstance(index_ref, AdminIndex) else index_ref
        self.config = config
        # Providers registered on the DRIVER are not visible in actor
        # processes (the registry is per-process), so pipelines resolve
        # the Provider object at build time and ship it in the
        # constructor; bare construction still resolves built-ins here.
        self.provider = provider if provider is not None else get_provider(config.provider)
        # generic-path per-polygon render, built lazily ONCE per actor
        # (an actor's provider+language are fixed for its lifetime)
        self._rendered: Optional[np.ndarray] = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        idx = self.index
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        n = len(lon)
        valid = ~(np.isnan(lon) | np.isnan(lat))

        win = np.full(n, -1, dtype=np.int64)
        if valid.any():
            win[valid] = idx.locate(lon[valid], lat[valid])

        knn_idx = np.full(n, -1, dtype=np.int64)
        knn_d = np.full(n, np.inf)
        if cfg.knn_fallback:
            need = valid & (win < 0)
            if need.any():
                ki, kd = idx.nearest_place(lon[need], lat[need], cfg.tolerance_m)
                knn_idx[need] = ki
                knn_d[need] = kd

        formatted = np.full(n, None, dtype=object)
        admin_ids = np.zeros(n, dtype=np.uint64)
        confidence = np.zeros(n, dtype=np.int8)
        match_kind = np.full(n, "miss", dtype=object)
        comp_out = {f: np.full(n, None, dtype=object) for f in COMPONENT_FIELDS}

        pip_rows = np.nonzero(win >= 0)[0]
        if len(pip_rows):
            a = win[pip_rows]
            admin_ids[pip_rows] = idx.admin_id[a]
            match_kind[pip_rows] = "pip"
            confidence[pip_rows] = 9
            for f in COMPONENT_FIELDS:
                comp_out[f][pip_rows] = idx.components[f][a]
            if cfg.provider == "openstreetmap":
                formatted[pip_rows] = idx.osm_formatted[a]  # pre-rendered fast path
            elif cfg.provider in ("opencage", "geoadmin") and not cfg.language:
                # opencage default render; geoadmin admin-polygon hits
                # have no building-register fields -> precomputed display
                formatted[pip_rows] = idx.formatted[a]  # pre-rendered fast path
            else:
                # generic/registered providers and language variants
                # (§2.7): render the per-polygon array once per actor,
                # then every batch is a pure numpy gather
                if self._rendered is None:
                    if cfg.provider == "geoadmin":
                        self._rendered = idx.formatted
                    else:
                        self._rendered = idx.render_all(self.provider, cfg.language)
                formatted[pip_rows] = self._rendered[a]

        knn_rows = np.nonzero((win < 0) & (knn_idx >= 0))[0]
        if len(knn_rows):
            p = knn_idx[knn_rows]
            match_kind[knn_rows] = "knn"
            confidence[knn_rows] = 5
            if cfg.provider == "geoadmin":
                formatted[knn_rows] = idx.place_geoadmin_label[p]
            else:
                formatted[knn_rows] = idx.place_label[p]

        # pass through every input column (ids, captions, cell ids, ...);
        # lon/lat re-appended so they sit next to the join outputs
        keep = [c for c in batch.column_names if c not in ("lon", "lat")]
        out = batch.select(keep)
        out = out.append_column("lon", batch.column("lon"))
        out = out.append_column("lat", batch.column("lat"))
        out = out.append_column("admin_id", pa.array(admin_ids, type=pa.uint64()))
        out = out.append_column("formatted", pa.array(formatted.tolist(), type=pa.string()))
        out = out.append_column("confidence", pa.array(confidence, type=pa.int8()))
        out = out.append_column("match_kind", pa.array(match_kind.tolist(), type=pa.string()))
        for f in COMPONENT_FIELDS:
            out = out.append_column(f, pa.array(comp_out[f].tolist(), type=pa.string()))
        if cfg.strict_nonempty:
            from ..functions.errors import REVERSE_EMPTY  # GeocodingError taxonomy (lib.rs:54-66)

            err = [None if f_ is not None else REVERSE_EMPTY for f_ in formatted.tolist()]
            out = out.append_column("error", pa.array(err, type=pa.string()))
        return out
