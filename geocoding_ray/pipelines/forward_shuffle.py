"""Forward geocoding, shuffle-join variant — for a gazetteer too large to
broadcast (SURVEY.md §2.5 "shuffle join (both sides large)").

Physical plan::

    gazetteer ──explode──> (jtoken, salt, place cols)      [replicated per
                                                            unique detail token;
                                                            hot tokens x S salts]
    queries   ──tokenize─> (jtoken, salt, query cols)      [ONE join token per
                                                            query: its rarest
                                                            known token]
    union ──groupby(jtoken, salt)──> map_groups(match+verify+rank+limit)
    (a query has exactly ONE join key, so all its candidates are in one
    group — ranking happens there; no second shuffle)

* **Join-key choice**: joining a query on its *rarest* token bounds the
  candidate set by that token's posting frequency; candidates are then
  verified against the full all-tokens predicate (same semantics as the
  broadcast ForwardJoiner, so both paths return identical results).
* **Salting**: tokens above ``hot_threshold`` (megacity names) get their
  gazetteer rows replicated to ``n_salts`` sub-keys and each query picks
  ``hash(query_id) % n_salts`` — no single reducer sees a whole hot key.
* **Token stats**: a distributed count over the exploded gazetteer feeds
  both the rarest-token choice and the hot set.  The stats table is
  bounded by the gazetteer *vocabulary* (place-name words), which is
  orders of magnitude smaller than the row count; it is broadcast via
  ``ray.put``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ForwardConfig
from ..functions.hashing import polyhash_strings

_PLACE_COLS = ("place_id", "name", "lon", "lat", "origin", "country_code", "rank", "weight", "importance", "detail", "label")

# Join keys are int64 BIT VIEWS of the polynomial token hash, not token
# strings: the shuffle moves fixed-width ints, and a 2^-64 hash collision
# merely merges two token groups — the all-tokens verify inside
# match_group keeps the result exact.


def _first_parquet(d: str) -> str:
    import os

    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            return os.path.join(d, f)
    raise FileNotFoundError(f"no parquet files under {d}")


from ..functions.normalize import dedup_tokens_per_row as _dedup_per_row
from ..functions.normalize import split_tokens_arrow as _split_tokens


def explode_gazetteer(batch: pa.Table) -> pa.Table:
    """gazetteer rows -> one row per unique detail token (vectorized:
    arrow split + hash-keyed per-row dedup; no per-row Python)."""
    flat, row_of, h, flat_idx = _split_tokens(batch.column("detail"))
    sel = _dedup_per_row(row_of, h)
    out = pa.table({"jtoken": pa.array(h[sel].view(np.int64), type=pa.int64())})
    take = pa.array(row_of[sel], type=pa.int64())
    for c in _PLACE_COLS:
        out = out.append_column(c, batch.column(c).take(take))
    return out


def make_salter(hot_ref, n_salts: int):
    """Replicate hot-token gazetteer rows across ``n_salts`` salt values.
    ``hot_ref``: sorted int64 array of hot token keys (searchsorted
    membership — vectorized)."""

    def salt_gaz(batch: pa.Table) -> pa.Table:
        import ray

        hot = ray.get(hot_ref) if not isinstance(hot_ref, np.ndarray) else hot_ref
        keys = batch.column("jtoken").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(hot, keys)
        is_hot = (pos < len(hot)) & (hot[np.minimum(pos, max(len(hot) - 1, 0))] == keys) if len(hot) else np.zeros(len(keys), dtype=bool)
        cold_idx = np.nonzero(~is_hot)[0]
        hot_idx = np.nonzero(is_hot)[0]
        take = np.concatenate([cold_idx, np.repeat(hot_idx, n_salts)])
        salts = np.concatenate(
            [np.zeros(len(cold_idx), dtype=np.int32), np.tile(np.arange(n_salts, dtype=np.int32), len(hot_idx))]
        )
        out = batch.take(pa.array(take, type=pa.int64()))
        return out.append_column("salt", pa.array(salts, type=pa.int32()))

    return salt_gaz


def make_query_keyer(stats_ref, hot_ref, n_salts: int, config: ForwardConfig, query_col: str, id_col: str):
    """queries -> (jtoken, salt, query_id, qtokens) rows; one per query.

    Fully vectorized: arrow tokenize -> hash-keyed per-row dedup ->
    searchsorted vocabulary lookup -> rarest-key argmin via one lexsort.
    ``stats_ref``: (sorted int64 token keys, int64 posting counts);
    ``hot_ref``: sorted int64 hot keys.  The rarest-token tie-break is
    (count, key) — ANY known token of the query is a complete join key
    (every matching place contains all query tokens), so the tie-break
    only affects load placement, never results.
    """
    import pyarrow.compute as pc

    from ..functions.normalize import normalize_arrow

    def key_queries(batch: pa.Table) -> pa.Table:
        import ray

        vh, vc = ray.get(stats_ref) if not isinstance(stats_ref, tuple) else stats_ref
        hot = ray.get(hot_ref) if not isinstance(hot_ref, np.ndarray) else hot_ref
        n = batch.num_rows
        ids = batch.column(id_col)
        norm = normalize_arrow(batch.column(query_col))
        flat, row_of, h, flat_idx = _split_tokens(norm)
        sel = _dedup_per_row(row_of, h)  # distinct (row, token), (row, hash)-sorted
        ro_d, h_d = row_of[sel], h[sel]
        key_d = h_d.view(np.int64)
        pos = np.searchsorted(vh, key_d)
        known = (pos < len(vh)) & (vh[np.minimum(pos, max(len(vh) - 1, 0))] == key_d) if len(vh) else np.zeros(len(key_d), dtype=bool)
        fr = np.where(known, vc[np.minimum(pos, max(len(vh) - 1, 0))] if len(vh) else 0, np.iinfo(np.int64).max)
        cnt_d = np.bincount(ro_d, minlength=n)
        cnt_known = np.bincount(ro_d[known], minlength=n)
        if config.ignore_oov:
            keep_row = cnt_known > 0
            tok_keep = known  # OOV tokens drop out of qtokens too
        else:
            keep_row = (cnt_d > 0) & (cnt_known == cnt_d)  # strict: any OOV -> no match
            tok_keep = np.ones(len(ro_d), dtype=bool)
        if not keep_row.any():
            return pa.table(
                {
                    "jtoken": pa.array([], type=pa.int64()),
                    "salt": pa.array([], type=pa.int32()),
                    "query_id": ids.slice(0, 0),
                    "qtokens": pa.array([], type=pa.string()),
                }
            )
        # rarest known token per row: one lexsort by (row, count, key)
        km = known & keep_row[ro_d]
        korder = np.lexsort((key_d[km], fr[km], ro_d[km]))
        kro = ro_d[km][korder]
        first = np.ones(len(kro), dtype=bool)
        first[1:] = kro[1:] != kro[:-1]
        jkey_by_row = np.zeros(n, dtype=np.int64)
        jkey_by_row[kro[first]] = key_d[km][korder][first]
        # canonical qtokens string per kept row (hash-ordered set join)
        tm = tok_keep & keep_row[ro_d]
        tcnt = np.bincount(ro_d[tm], minlength=n)[keep_row]
        loff = np.concatenate([[0], np.cumsum(tcnt)])
        tok_strings = flat.take(pa.array(flat_idx[sel[tm]], type=pa.int64()))
        qtokens = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(loff, type=pa.int32()), tok_strings), " "
        )
        rows = np.nonzero(keep_row)[0]
        jk = jkey_by_row[rows]
        pos_h = np.searchsorted(hot, jk)
        is_hot = (pos_h < len(hot)) & (hot[np.minimum(pos_h, max(len(hot) - 1, 0))] == jk) if len(hot) else np.zeros(len(jk), dtype=bool)
        id_take = ids.take(pa.array(rows, type=pa.int64()))
        id_arr = id_take.combine_chunks() if isinstance(id_take, pa.ChunkedArray) else id_take
        idh = polyhash_strings(id_arr.cast(pa.string()))
        salt = np.where(is_hot, (idh % np.uint64(n_salts)).astype(np.int32), np.int32(0))
        return pa.table(
            {
                "jtoken": pa.array(jk, type=pa.int64()),
                "salt": pa.array(salt.astype(np.int32), type=pa.int32()),
                "query_id": id_take,
                "qtokens": qtokens,
            }
        )

    return key_queries


def make_group_matcher(config: ForwardConfig):
    """Per (jtoken, salt) group: verify all-tokens, filter, score.

    Arrow-native group fn (round-2 VERDICT #8): the co-shuffled group
    carries null ``query_id`` on gazetteer rows, which Arrow represents
    losslessly (no pandas int64 -> float64 null-widening — the round-1
    hash-fail class is gone by construction, and ids above 2^53 stay
    exact).  All heavy work is numpy over zero-copy column views.
    """
    import pyarrow.compute as pc

    bbox = config.bbox
    # `is not None`, NOT truthiness: an EMPTY origins/countrycodes set
    # means "filter everything out" in the broadcast plan
    # (stages/forward.py:162-167) and the shuffle plan must agree
    origins = list(config.origins) if config.origins is not None else None
    ccodes = list(config.countrycodes) if config.countrycodes is not None else None
    limit = config.limit

    def _empty(qid_type: pa.DataType) -> pa.Table:
        return pa.table(
            {
                "query_id": pa.array([], type=qid_type),
                "place_id": pa.array([], type=pa.int64()),
                "name": pa.array([], type=pa.string()),
                "lon": pa.array([], type=pa.float64()),
                "lat": pa.array([], type=pa.float64()),
                "importance": pa.array([], type=pa.float64()),
                "weight": pa.array([], type=pa.int64()),
                "rk": pa.array([], type=pa.int64()),
            }
        )

    def match_group(g: pa.Table) -> pa.Table:
        qid_type = g.column("query_id").type
        side = g.column("side")
        qs = g.filter(pc.equal(side, "q"))
        ps = g.filter(pc.equal(side, "g"))
        if qs.num_rows == 0 or ps.num_rows == 0:
            return _empty(qid_type)
        # group-constant filters computed ONCE (not per query)
        base_ok = np.ones(ps.num_rows, dtype=bool)
        if origins is not None:
            base_ok &= pc.is_in(ps.column("origin"), value_set=pa.array(origins, type=pa.string())).to_numpy(
                zero_copy_only=False
            )
        if ccodes is not None:
            base_ok &= pc.is_in(
                pc.utf8_lower(ps.column("country_code")), value_set=pa.array(ccodes, type=pa.string())
            ).to_numpy(zero_copy_only=False)
        if bbox is not None:
            plon = ps.column("lon").to_numpy(zero_copy_only=False)
            plat = ps.column("lat").to_numpy(zero_copy_only=False)
            base_ok &= (plon >= bbox.minx) & (plon <= bbox.maxx) & (plat >= bbox.miny) & (plat <= bbox.maxy)
        if not base_ok.all():
            if not base_ok.any():
                return _empty(qid_type)
            ps = ps.filter(pa.array(base_ok))
        np_ = ps.num_rows
        # vectorized verify: candidate x detail-token-hash incidence
        # matrix built once per group; each distinct query token set is
        # one column gather + row-wise all() — no per-candidate Python
        from ..functions.normalize import split_tokens_arrow

        _, prow, ph, _ = split_tokens_arrow(ps.column("detail"))
        vocab, colinv = np.unique(ph, return_inverse=True)
        m = np.zeros((np_, len(vocab)), dtype=bool)
        if len(prow):
            m[prow, colinv] = True
        # dedup identical query token-sets: within a (token, salt) group
        # captions repeat heavily, so match once per distinct qtokens
        qtok_enc = pc.dictionary_encode(qs.column("qtokens").combine_chunks())
        uniq = qtok_enc.dictionary
        inv = qtok_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        imp = ps.column("importance").to_numpy(zero_copy_only=False)
        wgt = ps.column("weight").to_numpy(zero_copy_only=False).astype(np.int64)
        pid = ps.column("place_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # A query has exactly ONE join key, so ALL its candidates are in
        # this group — rank + limit here and skip any query_id re-shuffle.
        # Ranked once per DISTINCT caption (captions repeat heavily).
        _, qrow, qh, _ = split_tokens_arrow(uniq)
        qpos = np.searchsorted(vocab, qh) if len(vocab) else np.zeros(len(qh), dtype=np.int64)
        qknown = (
            (qpos < len(vocab)) & (vocab[np.minimum(qpos, max(len(vocab) - 1, 0))] == qh)
            if len(vocab)
            else np.zeros(len(qh), dtype=bool)
        )
        qcnt = np.bincount(qrow, minlength=len(uniq)) if len(qrow) else np.zeros(len(uniq), dtype=np.int64)
        qoffs = np.concatenate([[0], np.cumsum(qcnt)])  # qrow is row-major sorted
        match_idx: list[np.ndarray] = []
        for u in range(len(uniq)):
            s, e = qoffs[u], qoffs[u + 1]
            if s == e or not qknown[s:e].all():
                match_idx.append(np.zeros(0, dtype=np.int64))
                continue  # a token absent from every candidate -> no match
            ok = m[:, qpos[s:e]].all(axis=1)
            idx = np.nonzero(ok)[0]
            if len(idx):
                order = np.lexsort((pid[idx], -wgt[idx], -imp[idx]))
                idx = idx[order]
                if limit is not None:
                    idx = idx[:limit]
            match_idx.append(idx)
        per_uniq = np.array([len(mi) for mi in match_idx], dtype=np.int64)
        counts = per_uniq[inv]
        if counts.sum() == 0:
            return _empty(qid_type)
        q_rep = np.repeat(np.arange(qs.num_rows), counts)
        p_sel = np.concatenate([match_idx[inv[i]] for i in range(qs.num_rows) if counts[i]])
        rk = np.concatenate([np.arange(1, c + 1, dtype=np.int64) for c in counts if c])
        p_take = pa.array(p_sel, type=pa.int64())
        return pa.table(
            {
                "query_id": qs.column("query_id").take(pa.array(q_rep, type=pa.int64())),
                "place_id": pa.array(pid[p_sel], type=pa.int64()),
                "name": ps.column("name").take(p_take),
                "lon": ps.column("lon").take(p_take),
                "lat": ps.column("lat").take(p_take),
                "importance": pa.array(imp[p_sel], type=pa.float64()),
                "weight": pa.array(wgt[p_sel], type=pa.int64()),
                "rk": pa.array(rk, type=pa.int64()),
            }
        )

    return match_group



def run_forward_shuffle(
    images_path: str,
    gazetteer_path: str,
    config: ForwardConfig = ForwardConfig(),
    query_col: str = "caption",
    id_col: str = "image_id",
    n_salts: int = 8,
    hot_threshold: int = 200,
):
    """Token-key co-shuffle forward join.  Returns per-candidate rows
    (query_id, rk, place_id, name, lon, lat) — same ranking as the
    broadcast ForwardJoiner's explode mode."""
    import ray
    import ray.data as rd

    gaz = rd.read_parquet(gazetteer_path, columns=list(_PLACE_COLS))
    exploded = gaz.map_batches(explode_gazetteer, batch_format="pyarrow")

    # distributed token stats (vocabulary-bounded), then broadcast as
    # sorted key/count arrays for searchsorted lookup inside the keyer
    from ray.data.aggregate import Count

    stats_rows = exploded.groupby("jtoken").aggregate(Count(alias_name="n")).take_all()
    vh = np.array([r["jtoken"] for r in stats_rows], dtype=np.int64)
    vc = np.array([int(r["n"]) for r in stats_rows], dtype=np.int64)
    order = np.argsort(vh, kind="stable")
    vh, vc = vh[order], vc[order]
    hot = np.sort(vh[vc >= hot_threshold])
    stats_ref = ray.put((vh, vc))
    hot_ref = ray.put(hot)

    gaz_keyed = exploded.map_batches(make_salter(hot_ref, n_salts), batch_format="pyarrow")
    queries = rd.read_parquet(images_path, columns=[id_col, query_col])
    q_keyed = queries.map_batches(
        make_query_keyer(stats_ref, hot_ref, n_salts, config, query_col, id_col), batch_format="pyarrow"
    )

    # unify schemas and union for the co-shuffle.  Types are resolved
    # HERE on the driver — calling .schema() inside the closures would
    # execute a nested Dataset inside each map task.
    import pyarrow.parquet as pq_

    first = (
        images_path[0]
        if isinstance(images_path, (list, tuple))
        else (images_path if images_path.endswith(".parquet") else _first_parquet(images_path))
    )
    qid_type = pq_.read_schema(first).field(id_col).type
    gaz_first = gazetteer_path if gazetteer_path.endswith(".parquet") else _first_parquet(gazetteer_path)
    gaz_schema = pq_.read_schema(gaz_first)
    place_types = {c: gaz_schema.field(c).type for c in _PLACE_COLS}

    def tag_gaz(b: pa.Table) -> pa.Table:
        b = b.append_column("side", pa.array(["g"] * b.num_rows, type=pa.string()))
        b = b.append_column("query_id", pa.nulls(b.num_rows, type=qid_type))
        return b.append_column("qtokens", pa.nulls(b.num_rows, type=pa.string()))

    def tag_q(b: pa.Table) -> pa.Table:
        b = b.append_column("side", pa.array(["q"] * b.num_rows, type=pa.string()))
        for c in _PLACE_COLS:
            b = b.append_column(c, pa.nulls(b.num_rows, type=place_types[c]))
        return b

    cols = ["jtoken", "salt", "side", "query_id", "qtokens"] + list(_PLACE_COLS)
    both = gaz_keyed.map_batches(tag_gaz, batch_format="pyarrow").select_columns(cols).union(
        q_keyed.map_batches(tag_q, batch_format="pyarrow").select_columns(cols)
    )

    # ranking + limit happen inside match_group (a query's single join
    # key puts all its candidates in one group), so no query_id re-shuffle
    return both.groupby(["jtoken", "salt"]).map_groups(
        make_group_matcher(config), batch_format="pyarrow"
    )
