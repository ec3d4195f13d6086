"""Forward geocoding: text -> ranked candidate points (SURVEY.md O2/O5-O11).

Matching semantics (engine-defined, deterministic — the providers'
full-text ranking is opaque): a gazetteer place is a candidate for a
query iff **every** normalized query token appears among the place's
normalized ``detail`` tokens (GeoAdmin matches against exactly such a
normalized string, geoadmin.rs:344, 381).  Candidates are ranked by
(importance desc, weight desc, place_id asc) — a total order built from
the providers' ranking fields (openstreetmap.rs:316 ``importance``,
geoadmin.rs:379-380 ``weight``/``rank``; SURVEY.md §2.6).

Physical plan (broadcast variant, build side small-to-medium): a
token -> posting-list inverted index is built once on the driver
(:class:`GazetteerIndex`), broadcast via ``ray.put``, and each
:class:`ForwardJoiner` actor intersects posting lists per query —
rarest token first, so common tokens never materialize large candidate
sets.  The shuffle variant for a *large* gazetteer lives in
``pipelines/forward_shuffle.py``.

Options reproduced: bbox restriction (opencage.rs:305-308,
openstreetmap.rs:162-165 viewbox, geoadmin.rs:178-187 incl. WGS84->LV03
corner transform), origins layer filter (geoadmin.rs:69, 173), per-query
limit/top-k (geoadmin.rs:71, opencage.rs:60), CRS axis convention on
output points (geoadmin.rs:245-255).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..config import ForwardConfig
from ..functions.normalize import tokenize
from ..state.crs import project_points
from ..state.geometry import points_in_bbox


class GazetteerIndex:
    """Immutable forward-join build side: token inverted index over
    normalized ``detail`` text + ranking/geometry arrays."""

    def __init__(self, gazetteer_tbl: pa.Table):
        self.place_id = gazetteer_tbl.column("place_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        self.lon = gazetteer_tbl.column("lon").to_numpy(zero_copy_only=False)
        self.lat = gazetteer_tbl.column("lat").to_numpy(zero_copy_only=False)
        self.rank = gazetteer_tbl.column("rank").to_numpy(zero_copy_only=False).astype(np.int64)
        self.weight = gazetteer_tbl.column("weight").to_numpy(zero_copy_only=False).astype(np.int64)
        self.importance = gazetteer_tbl.column("importance").to_numpy(zero_copy_only=False)
        self.confidence = gazetteer_tbl.column("confidence").to_numpy(zero_copy_only=False).astype(np.int8)
        self.origin = np.array(gazetteer_tbl.column("origin").to_pylist(), dtype=object)
        if "country_code" in gazetteer_tbl.column_names:
            self.country_code = np.array(
                [c.lower() if c else None for c in gazetteer_tbl.column("country_code").to_pylist()], dtype=object
            )
        else:  # legacy gazetteer without the column: restriction matches nothing
            self.country_code = np.full(gazetteer_tbl.num_rows, None, dtype=object)
        self.house_number = (
            np.array(gazetteer_tbl.column("house_number").to_pylist(), dtype=object)
            if "house_number" in gazetteer_tbl.column_names
            else np.full(gazetteer_tbl.num_rows, None, dtype=object)
        )
        self.name = np.array(gazetteer_tbl.column("name").to_pylist(), dtype=object)
        self.label = np.array(gazetteer_tbl.column("label").to_pylist(), dtype=object)
        details = gazetteer_tbl.column("detail").to_pylist()

        postings: dict[str, list[int]] = {}
        for i, d in enumerate(details):
            for t in set(d.split(" ")) if d else ():
                postings.setdefault(t, []).append(i)
        self.postings = {t: np.array(v, dtype=np.int64) for t, v in postings.items()}
        # pre-sorted ranking key per place for fast per-query top-k:
        # order places once by (importance desc, weight desc, place_id asc)
        self.rank_order = np.lexsort((self.place_id, -self.weight, -self.importance))
        self.rank_pos = np.empty(len(self.place_id), dtype=np.int64)
        self.rank_pos[self.rank_order] = np.arange(len(self.place_id))

    def match(self, query: str, ignore_oov: bool = False) -> np.ndarray:
        """Candidate place indices for a query (unranked).

        ``ignore_oov=True`` drops tokens absent from the gazetteer
        vocabulary before requiring the rest to all match — the caption
        mode ("photo near X" noise words); an address-mode query
        (``ignore_oov=False``) with any unknown token matches nothing.
        """
        toks = tokenize(query)
        if not toks:
            return np.zeros(0, dtype=np.int64)
        lists = []
        for t in set(toks):
            pl = self.postings.get(t)
            if pl is None:
                if ignore_oov:
                    continue
                return np.zeros(0, dtype=np.int64)
            lists.append(pl)
        if not lists:
            return np.zeros(0, dtype=np.int64)
        lists.sort(key=len)  # rarest first
        cand = lists[0]
        for pl in lists[1:]:
            cand = np.intersect1d(cand, pl, assume_unique=True)
            if len(cand) == 0:
                break
        return cand


class ForwardJoiner:
    """Actor-pool ``map_batches`` stage: query text -> candidate list.

    Emits one row per query with ``points`` as ``list<struct<lon,lat>>``
    in rank order (``Vec<Point<T>>``, lib.rs:133) plus top-1 metadata
    columns for downstream projection / oracle comparison.
    """

    def __init__(
        self,
        index_ref,
        config: ForwardConfig = ForwardConfig(),
        query_col: str = "caption",
        id_col: str = "image_id",
        explode: bool | None = None,
    ):
        import ray

        self.index: GazetteerIndex = ray.get(index_ref) if not isinstance(index_ref, GazetteerIndex) else index_ref
        self.config = config
        self.query_col = query_col
        self.id_col = id_col
        # explode=True emits one row per candidate with rank position —
        # the ``forward_full`` projection (opencage.rs:284-328,
        # geoadmin.rs:158-202) flattened for columnar consumers.  When
        # not forced, it follows ``config.addressdetails``
        # (openstreetmap.rs:36-43: addressdetails requests per-candidate
        # address structs — the flattened per-candidate rows here).
        self.explode = config.addressdetails if explode is None else explode
        # per-actor memo: query text -> ranked candidate indices.  Real
        # caption corpora repeat place mentions heavily; the memo turns
        # repeats into a dict hit.  Bounded to keep actor heaps flat.
        self._memo: dict[str, np.ndarray] = {}
        self._memo_cap = 200_000

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        idx = self.index
        queries = batch.column(self.query_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        n = len(queries)

        out_points: list[list[dict]] = []
        out_n = np.zeros(n, dtype=np.int32)
        top_name = np.full(n, None, dtype=object)
        top_label = np.full(n, None, dtype=object)
        top_place = np.zeros(n, dtype=np.uint64)
        top_lon = np.full(n, np.nan)
        top_lat = np.full(n, np.nan)

        bbox = cfg.bbox
        origins = set(cfg.origins) if cfg.origins else None
        ccodes = cfg.countrycodes  # opencage.rs:55-70 countrycode restriction
        limit = cfg.limit
        ex_rows: list[tuple] = []  # explode mode: (i, rk, place array idx)

        for i, q in enumerate(queries):
            cand = self._memo.get(q) if q else None
            if cand is None:
                cand = idx.match(q, ignore_oov=cfg.ignore_oov) if q else np.zeros(0, dtype=np.int64)
                if len(cand) and origins is not None:
                    keep = np.array([o in origins for o in idx.origin[cand]], dtype=bool)
                    cand = cand[keep]
                if len(cand) and ccodes is not None:
                    keep = np.array([c in ccodes for c in idx.country_code[cand]], dtype=bool)
                    cand = cand[keep]
                if len(cand) and bbox is not None:
                    keep = points_in_bbox(idx.lon[cand], idx.lat[cand], bbox.minx, bbox.miny, bbox.maxx, bbox.maxy)
                    cand = cand[keep]
                # rank: stable order by precomputed global rank position
                cand = cand[np.argsort(idx.rank_pos[cand], kind="stable")]
                if limit is not None:
                    cand = cand[:limit]
                if q is not None and len(self._memo) < self._memo_cap:
                    self._memo[q] = cand
            if len(cand) == 0:
                out_points.append([])
                continue
            lon = idx.lon[cand]
            lat = idx.lat[cand]
            px, py = project_points(lon, lat, cfg.sr)
            if cfg.sr in ("21781", "2056"):
                # the reference swaps to (easting, northing) via
                # Point::new(y, x) — geoadmin.rs:245-255; project_points
                # already returns (e, n), matching the swapped order.
                pass
            out_points.append([{"lon": float(x), "lat": float(y)} for x, y in zip(px, py)])
            out_n[i] = len(cand)
            top_name[i] = idx.name[cand[0]]
            top_label[i] = idx.label[cand[0]]
            top_place[i] = idx.place_id[cand[0]]
            top_lon[i] = px[0]
            top_lat[i] = py[0]
            if self.explode:
                for rk, c in enumerate(cand, start=1):
                    ex_rows.append((i, rk, int(c)))

        id_arr = batch.column(self.id_col)
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()

        if self.explode:
            qi = np.array([r[0] for r in ex_rows], dtype=np.int64)
            rks = np.array([r[1] for r in ex_rows], dtype=np.int64)
            ci = np.array([r[2] for r in ex_rows], dtype=np.int64)
            return pa.table(
                {
                    "query_id": id_arr.take(pa.array(qi)) if len(qi) else id_arr.slice(0, 0),
                    "rk": pa.array(rks, type=pa.int64()),
                    "place_id": pa.array(idx.place_id[ci] if len(ci) else np.zeros(0, np.uint64), type=pa.uint64()).cast(pa.int64()),
                    "name": pa.array(idx.name[ci].tolist() if len(ci) else [], type=pa.string()),
                    "lon": pa.array(idx.lon[ci] if len(ci) else np.zeros(0), type=pa.float64()),
                    "lat": pa.array(idx.lat[ci] if len(ci) else np.zeros(0), type=pa.float64()),
                    "importance": pa.array(idx.importance[ci] if len(ci) else np.zeros(0), type=pa.float64()),
                    # per-candidate address-detail columns (the flattened
                    # AddressDetails role, openstreetmap.rs:322-337)
                    "origin": pa.array(idx.origin[ci].tolist() if len(ci) else [], type=pa.string()),
                    "label": pa.array(idx.label[ci].tolist() if len(ci) else [], type=pa.string()),
                    "house_number": pa.array(idx.house_number[ci].tolist() if len(ci) else [], type=pa.string()),
                    "country_code": pa.array(idx.country_code[ci].tolist() if len(ci) else [], type=pa.string()),
                }
            )

        out = pa.table(
            {
                "query_id": id_arr,
                "query": pa.array(queries, type=pa.string()),
                "points": pa.array(out_points, type=pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
                "n_candidates": pa.array(out_n, type=pa.int32()),
                "top_place_id": pa.array(top_place, type=pa.uint64()),
                "top_name": pa.array(top_name.tolist(), type=pa.string()),
                "top_label": pa.array(top_label.tolist(), type=pa.string()),
                "top_lon": pa.array(np.where(np.isnan(top_lon), None, top_lon), type=pa.float64(), from_pandas=True),
                "top_lat": pa.array(np.where(np.isnan(top_lat), None, top_lat), type=pa.float64(), from_pandas=True),
            }
        )
        return out
