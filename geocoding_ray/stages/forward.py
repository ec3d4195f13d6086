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
        # sorted vocabulary hashes: the actors' vectorized known-token
        # test (searchsorted) — same polynomial family as the query-side
        # batch tokenizer
        from ..functions.hashing import polyhash_strings

        self.vocab_hashes = np.sort(polyhash_strings(pa.array(list(self.postings.keys()), type=pa.string())))
        # pre-sorted ranking key per place for fast per-query top-k:
        # order places once by (importance desc, weight desc, place_id asc)
        self.rank_order = np.lexsort((self.place_id, -self.weight, -self.importance))
        self.rank_pos = np.empty(len(self.place_id), dtype=np.int64)
        self.rank_pos[self.rank_order] = np.arange(len(self.place_id))

    def match(self, query: str, ignore_oov: bool = False) -> np.ndarray:
        """Candidate place indices for a query string (unranked)."""
        return self.match_tokens(tokenize(query), ignore_oov=ignore_oov)

    def match_tokens(self, toks: list[str], ignore_oov: bool = False) -> np.ndarray:
        """Candidate place indices for pre-tokenized queries.

        ``ignore_oov=True`` drops tokens absent from the gazetteer
        vocabulary before requiring the rest to all match — the caption
        mode ("photo near X" noise words); an address-mode query
        (``ignore_oov=False``) with any unknown token matches nothing.
        """
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

    _EMPTY = np.zeros(0, dtype=np.int64)

    def _ranked_candidates(self, key: str) -> np.ndarray:
        """Filtered + ranked candidate indices for a canonical token-set
        key (config filters are actor constants, so memoizing on the key
        alone is sound)."""
        cfg = self.config
        idx = self.index
        cand = idx.match_tokens(key.split(" "), ignore_oov=cfg.ignore_oov) if key else self._EMPTY
        if len(cand) and cfg.origins is not None:
            org = set(cfg.origins)
            cand = cand[np.array([o in org for o in idx.origin[cand]], dtype=bool)]
        if len(cand) and cfg.countrycodes is not None:  # opencage.rs:55-70
            cc = cfg.countrycodes
            cand = cand[np.array([c in cc for c in idx.country_code[cand]], dtype=bool)]
        if len(cand) and cfg.bbox is not None:
            b = cfg.bbox
            cand = cand[points_in_bbox(idx.lon[cand], idx.lat[cand], b.minx, b.miny, b.maxx, b.maxy)]
        # rank: stable order by precomputed global rank position
        cand = cand[np.argsort(idx.rank_pos[cand], kind="stable")]
        if cfg.limit is not None:
            cand = cand[: cfg.limit]
        return cand

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized batch path: arrow-kernel tokenize -> searchsorted
        known-token test -> one canonical token-set key per query (so
        the memo collapses BOTH repeated captions and distinct captions
        whose known tokens coincide — "photo 17 of X" and "photo 18 of
        X" share a key) -> posting-list intersection once per distinct
        key -> arrow-native output assembly.  No per-row Python beyond
        tiny dict lookups.
        """
        import pyarrow.compute as pc

        from ..functions.normalize import dedup_tokens_per_row, normalize_arrow, split_tokens_arrow

        cfg = self.config
        idx = self.index
        n = batch.num_rows
        id_arr = batch.column(self.id_col)
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        query_arr = batch.column(self.query_col)
        if isinstance(query_arr, pa.ChunkedArray):
            query_arr = query_arr.combine_chunks()

        # --- collapse repeated captions first: the entire front half
        # (normalize, split, hash, memo) runs once per DISTINCT caption
        qobj = np.asarray(pc.fill_null(query_arr, "").cast(pa.string()).to_pylist(), dtype=object)
        quniq, inv = np.unique(qobj, return_inverse=True)
        nu = len(quniq)

        # --- canonical token-set key per distinct caption (vectorized) ---
        flat, row_of, h, flat_idx = split_tokens_arrow(normalize_arrow(pa.array(quniq.tolist(), type=pa.string())))
        sel = dedup_tokens_per_row(row_of, h)  # distinct (caption, token), hash-sorted
        ro_d, h_d = row_of[sel], h[sel]
        vh = idx.vocab_hashes
        if len(vh):
            pos = np.searchsorted(vh, h_d)
            known = (pos < len(vh)) & (vh[np.minimum(pos, len(vh) - 1)] == h_d)
        else:
            known = np.zeros(len(h_d), dtype=bool)
        cnt_d = np.bincount(ro_d, minlength=nu)
        cnt_known = np.bincount(ro_d[known], minlength=nu)
        if cfg.ignore_oov:
            keep_u = cnt_known > 0
            tok_keep = known  # OOV noise tokens leave the key too
        else:
            keep_u = (cnt_d > 0) & (cnt_known == cnt_d)  # strict: any OOV -> no match
            tok_keep = np.ones(len(ro_d), dtype=bool)
        tm = tok_keep & keep_u[ro_d]
        tcnt = np.bincount(ro_d[tm], minlength=nu)
        loff = np.concatenate([[0], np.cumsum(tcnt)])
        tok_strings = flat.take(pa.array(flat_idx[sel[tm]], type=pa.int64()))
        keys_arr = pc.binary_join(pa.ListArray.from_arrays(pa.array(loff, type=pa.int32()), tok_strings), " ")
        keys = keys_arr.to_pylist()  # "" for captions with no usable tokens

        # --- resolve distinct keys through the per-actor memo ---
        local: dict[str, np.ndarray] = {}
        cands_u: list[np.ndarray] = []
        for u in range(nu):
            if not keep_u[u]:
                cands_u.append(self._EMPTY)
                continue
            k = keys[u]
            cand = self._memo.get(k)
            if cand is None:
                cand = local.get(k)
            if cand is None:
                cand = self._ranked_candidates(k)
                if len(self._memo) < self._memo_cap:
                    self._memo[k] = cand
                else:
                    local[k] = cand
            cands_u.append(cand)
        counts_u = np.fromiter((len(c) for c in cands_u), dtype=np.int64, count=nu)
        offs_u = np.concatenate([[0], np.cumsum(counts_u)])
        flat_u = np.concatenate([c for c in cands_u if len(c)]) if counts_u.sum() else self._EMPTY

        # --- scatter back to rows (pure index arithmetic) ---
        counts = counts_u[inv]
        total = int(counts.sum())
        offs = np.concatenate([[0], np.cumsum(counts)])
        within = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts)
        flat_c = flat_u[np.repeat(offs_u[:-1][inv], counts) + within] if total else self._EMPTY

        # --- vectorized projection + output assembly over flat candidates ---
        px, py = project_points(idx.lon[flat_c], idx.lat[flat_c], cfg.sr)
        # sr 21781/2056: the reference swaps to (easting, northing) via
        # Point::new(y, x) — geoadmin.rs:245-255; project_points already
        # returns (e, n), matching the swapped order.

        if self.explode:
            q_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
            rks = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], counts) + 1
            return pa.table(
                {
                    "query_id": id_arr.take(pa.array(q_rep)) if total else id_arr.slice(0, 0),
                    "rk": pa.array(rks, type=pa.int64()),
                    "place_id": pa.array(idx.place_id[flat_c].astype(np.int64), type=pa.int64()),
                    "name": pa.array(idx.name[flat_c].tolist(), type=pa.string()),
                    "lon": pa.array(idx.lon[flat_c], type=pa.float64()),
                    "lat": pa.array(idx.lat[flat_c], type=pa.float64()),
                    "importance": pa.array(idx.importance[flat_c], type=pa.float64()),
                    # per-candidate address-detail columns (the flattened
                    # AddressDetails role, openstreetmap.rs:322-337)
                    "origin": pa.array(idx.origin[flat_c].tolist(), type=pa.string()),
                    "label": pa.array(idx.label[flat_c].tolist(), type=pa.string()),
                    "house_number": pa.array(idx.house_number[flat_c].tolist(), type=pa.string()),
                    "country_code": pa.array(idx.country_code[flat_c].tolist(), type=pa.string()),
                }
            )

        struct = pa.StructArray.from_arrays(
            [pa.array(px, type=pa.float64()), pa.array(py, type=pa.float64())], ["lon", "lat"]
        )
        points = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), struct)
        has = counts > 0
        first = offs[:-1][has]
        top_place = np.zeros(n, dtype=np.uint64)
        top_place[has] = idx.place_id[flat_c[first]] if total else []
        top_name = np.full(n, None, dtype=object)
        top_label = np.full(n, None, dtype=object)
        top_lon = np.full(n, np.nan)
        top_lat = np.full(n, np.nan)
        if total:
            top_name[has] = idx.name[flat_c[first]]
            top_label[has] = idx.label[flat_c[first]]
            top_lon[has] = px[first]
            top_lat[has] = py[first]
        return pa.table(
            {
                "query_id": id_arr,
                "query": query_arr.cast(pa.string()),
                "points": points,
                "n_candidates": pa.array(counts.astype(np.int32), type=pa.int32()),
                "top_place_id": pa.array(top_place, type=pa.uint64()),
                "top_name": pa.array(top_name.tolist(), type=pa.string()),
                "top_label": pa.array(top_label.tolist(), type=pa.string()),
                "top_lon": pa.array(np.where(np.isnan(top_lon), None, top_lon), type=pa.float64(), from_pandas=True),
                "top_lat": pa.array(np.where(np.isnan(top_lat), None, top_lat), type=pa.float64(), from_pandas=True),
            }
        )
