"""Similarity search over an embedding column (``list<float>``).

* :class:`BruteForceTopK` — the exactness baseline: queries are a small
  broadcast matrix (``ray.put`` once); each actor does one float64
  matmul per batch against its slice of the database stream.  The
  *database* streams through ``map_batches``; only the query matrix is
  resident.  Emits per-batch partial top-k; a final small
  ``groupby(qid)`` reduce merges partials — so no stage ever holds the
  full database.
* :class:`IVFTopK` — the scale path: k-means-lite (fixed-seed numpy
  Lloyd iterations on a sample) coarse quantizer built on the driver;
  each database row is assigned to its nearest centroid inside
  ``map_batches``; queries probe ``nprobe`` nearest centroids, so each
  batch only scores rows whose centroid is probed.

Ranking is deterministic: similarity rounded to 6 decimals, descending,
then neighbor id ascending — float64 everywhere so the DuckDB oracle
(``list_cosine_similarity``) agrees after rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embeddings_to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """Arrow list<float> column -> float64 (n, d) matrix (zero-copy flatten)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    lens = np.diff(arr.offsets.to_numpy())
    d = int(lens[0]) if len(lens) else 0
    if len(lens) and not np.all(lens == d):
        raise ValueError("ragged embedding column")
    return flat.reshape(-1, d)


class BruteForceTopK:
    """map_batches actor: database batch -> partial top-k rows per query.

    Output rows: (qid, nid, sim) — merged downstream by a small
    ``groupby(qid).map_groups`` final top-k.
    """

    def __init__(self, queries_ref, k: int = 5, id_col: str = "vec_id", exclude_self: bool = True):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, qmat = q
        self.qmat = _normalize_rows(np.asarray(qmat, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize_rows(embeddings_to_matrix(batch))
        sims = self.qmat @ mat.T  # (nq, nb)
        sims = np.round(sims, 6)
        nq, nb = sims.shape
        out_q, out_n, out_s = [], [], []
        # per-query partial top-k by the FULL deterministic order
        # (sim desc, nid asc).  argpartition is unsafe here: it picks
        # arbitrarily among candidates tied at the boundary, breaking the
        # documented tie-break (and the oracle) on duplicate embeddings.
        for qi in range(nq):
            order = np.lexsort((ids, -sims[qi]))
            if self.exclude_self:
                order = order[ids[order] != self.qids[qi]]
            order = order[: self.k]
            out_q.append(np.full(len(order), self.qids[qi], dtype=np.int64))
            out_n.append(ids[order])
            out_s.append(sims[qi, order])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q) if out_q else np.zeros(0, np.int64), type=pa.int64()),
                "nid": pa.array(np.concatenate(out_n) if out_n else np.zeros(0, np.int64), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s) if out_s else np.zeros(0), type=pa.float64()),
            }
        )


def final_topk(group, k: int = 5):
    """Per-qid merge of partial top-k rows (pandas group in/out)."""
    import pandas as pd

    g = group.sort_values(["sim", "nid"], ascending=[False, True], kind="stable").head(k)
    g = g.reset_index(drop=True)
    g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def final_topk_arrow(group: pa.Table, k: int = 5) -> pa.Table:
    """Per-qid merge of partial top-k rows, Arrow in/out — keeps the ANN
    pipeline pyarrow end-to-end (no pandas block schema mixing)."""
    sim = group.column("sim").to_numpy(zero_copy_only=False)
    nid = group.column("nid").to_numpy(zero_copy_only=False)
    order = np.lexsort((nid, -sim))[:k]
    out = group.take(pa.array(order, type=pa.int64()))
    return out.append_column("rk", pa.array(np.arange(1, len(order) + 1, dtype=np.int64), type=pa.int64()))


def build_ivf_centroids(sample: np.ndarray, n_centroids: int = 16, iters: int = 10, seed: int = 99) -> np.ndarray:
    """Fixed-seed Lloyd iterations on a driver-side sample (the coarse
    quantizer of the IVF scale path)."""
    rng = np.random.RandomState(seed)
    sample = _normalize_rows(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


class IVFTopK(BruteForceTopK):
    """IVF-pruned variant: scores only database rows whose centroid is
    among each query's ``nprobe`` nearest centroids."""

    def __init__(self, queries_ref, centroids_ref, k: int = 5, nprobe: int = 4, id_col: str = "vec_id", exclude_self: bool = True):
        super().__init__(queries_ref, k=k, id_col=id_col, exclude_self=exclude_self)
        import ray

        cent = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.centroids = cent
        probe = np.argsort(-(self.qmat @ cent.T), axis=1, kind="stable")[:, :nprobe]
        # (n_centroids, nq) bool membership matrix: probe_mask[c, qi] is
        # True when query qi probes centroid c — one vectorized gather
        # per batch instead of per-row Python membership tests
        self.probe_mask = np.zeros((len(cent), len(self.qids)), dtype=bool)
        for qi, row in enumerate(probe):
            self.probe_mask[row, qi] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize_rows(embeddings_to_matrix(batch))
        assign = np.argmax(mat @ self.centroids.T, axis=1)
        sims = np.round(self.qmat @ mat.T, 6)
        probed = self.probe_mask[assign]  # (nb, nq) — vectorized
        out_q, out_n, out_s = [], [], []
        for qi in range(len(self.qids)):
            mask = probed[:, qi]
            if self.exclude_self:
                mask = mask & (ids != self.qids[qi])
            cols = np.nonzero(mask)[0]
            if len(cols) == 0:
                continue
            s = sims[qi, cols]
            order = np.lexsort((ids[cols], -s))[: self.k]
            out_q.append(np.full(len(order), self.qids[qi], dtype=np.int64))
            out_n.append(ids[cols][order])
            out_s.append(s[order])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q) if out_q else np.zeros(0, np.int64), type=pa.int64()),
                "nid": pa.array(np.concatenate(out_n) if out_n else np.zeros(0, np.int64), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s) if out_s else np.zeros(0), type=pa.float64()),
            }
        )
