"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (engine extension for training-data pipelines).

Scale design (SURVEY.md §2.6 / ray guide):

* exact — add a content-hash column in a vectorized ``map_batches``,
  then hash-partition ``groupby(hash)`` with *native* Min/Count
  aggregates (no per-group Python); the shuffle moves only
  (hash, id) pairs, never payloads.
* MinHash LSH — signatures per batch (stateless, vectorized) ->
  explode to (band, band_hash, doc_id) rows -> ``groupby`` on the
  band key -> per-bucket candidate pairs -> exact-Jaccard verify.
  Buckets are tiny by construction; the all-to-all moves 16 small
  rows per doc.
* SimHash — 64-bit fingerprint per doc; near-dup = Hamming <= t
  within ``groupby`` buckets keyed by bit-bands (4x16-bit chunks:
  two dups within Hamming<=3 share at least one chunk only
  probabilistically — chunks give candidate recall, verify gives
  precision).
* embedding cosine — see ``stages/ann.py`` (same kernel, threshold
  instead of top-k).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import (
    char_shingles,
    jaccard,
    minhash_bands,
    minhash_params,
    minhash_signature,
    ngram_set,
    simhash64,
    stable_u64,
)
from ..functions.normalize import normalize_text, tokenize

# 128 perms in 8 bands of 16 rows -> LSH threshold ~(1/8)^(1/16) ~ 0.88,
# so pairs below ~0.7 Jaccard rarely collide (the corpus shares a small
# vocabulary, making shallow bands collide constantly).
NUM_PERM = 128
NUM_BANDS = 8
SHINGLE_K = 5
# Safety valve for degenerate buckets (all-identical boilerplate): a
# bucket of m docs emits m(m-1)/2 pairs; cap the per-bucket fan-out to
# the first MAX_BUCKET ids (deterministic: sorted doc_id order).  Real
# dups still pair through their other bands.
MAX_BUCKET = 64


def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    from ..functions.hashing import md5_hex

    texts = [t or "" for t in batch.column(text_col).to_pylist()]
    return batch.append_column("text_md5", pa.array(md5_hex(texts), type=pa.string()))


class MinHashStage:
    """Actor stage: text -> LSH band rows (band, band_hash, doc_id).

    MinHash (a, b) parameters are built once per actor in ``__init__``
    (stateful-setup-once rule); per batch the work is numpy over the
    shingle sets.
    """

    def __init__(self, num_perm: int = NUM_PERM, num_bands: int = NUM_BANDS, shingle_k: int = SHINGLE_K):
        self.a, self.b = minhash_params(num_perm)
        self.num_bands = num_bands
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(texts)
        out_band = np.empty(n * self.num_bands, dtype=np.int32)
        out_hash = np.empty(n * self.num_bands, dtype=np.uint64)
        out_id = np.empty(n * self.num_bands, dtype=np.int64)
        for i, t in enumerate(texts):
            sh = char_shingles(normalize_text(t or ""), self.shingle_k)
            sig = minhash_signature(sh, self.a, self.b)
            bands = minhash_bands(sig, self.num_bands)
            s = i * self.num_bands
            out_band[s : s + self.num_bands] = np.arange(self.num_bands)
            out_hash[s : s + self.num_bands] = bands
            out_id[s : s + self.num_bands] = ids[i]
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_hash": pa.array(out_hash, type=pa.uint64()),
                "doc_id": pa.array(out_id, type=pa.int64()),
            }
        )


def bucket_candidate_pairs(group: "pa.Table") -> pa.Table:
    """Per (band, band_hash) bucket: emit unordered candidate pairs."""
    ids = np.sort(np.unique(group.column("doc_id").to_numpy(zero_copy_only=False)))[:MAX_BUCKET]
    if len(ids) < 2:
        return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pa.table({"a": pa.array(ids[ia], type=pa.int64()), "b": pa.array(ids[ib], type=pa.int64())})


class JaccardVerify:
    """Actor stage: verify candidate pairs by exact shingle Jaccard.

    The doc texts needed per pair are looked up from a broadcast
    id -> normalized-text store (``ray.put`` once).  For corpora too
    large to broadcast, co-shuffle text alongside the pair rows
    instead; fixtures and sf-scale corpora fit comfortably.
    """

    _CACHE_CAP = 200_000

    def __init__(self, texts_ref, threshold: float = 0.8, shingle_k: int = SHINGLE_K):
        import ray

        self.texts: dict[int, str] = ray.get(texts_ref) if not isinstance(texts_ref, dict) else texts_ref
        self.threshold = threshold
        self.shingle_k = shingle_k
        self._cache: dict[int, np.ndarray] = {}

    def _sh(self, i: int) -> np.ndarray:
        s = self._cache.get(i)
        if s is None:
            s = char_shingles(normalize_text(self.texts.get(i, "")), self.shingle_k)
            if len(self._cache) < self._CACHE_CAP:  # bound long-lived actor heaps
                self._cache[i] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        sims = np.array([jaccard(self._sh(int(x)), self._sh(int(y))) for x, y in zip(a, b)])
        keep = sims >= self.threshold
        return pa.table(
            {
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(sims[keep], type=pa.float64()),
            }
        )


def simhash_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless stage: 64-bit SimHash per doc + 4x16-bit band keys."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    fps = np.empty(n, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = tokenize(t or "")
        fps[i] = simhash64(stable_u64(toks)) if toks else 0
    out = batch.append_column("simhash", pa.array(fps.astype(np.int64), type=pa.int64()))
    for bnd in range(4):
        chunk = ((fps >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int32)
        out = out.append_column(f"sim_band{bnd}", pa.array(chunk, type=pa.int32()))
    return out


def ngram_jaccard_pairs(texts_by_id: dict[int, str], n: int = 3, threshold: float = 0.5) -> pa.Table:
    """Driver-side exact n-gram Jaccard over a *small* candidate set
    (test helper / verify kernel; the distributed path is LSH->verify)."""
    ids = sorted(texts_by_id)
    sets = {i: ngram_set(tokenize(texts_by_id[i]), n) for i in ids}
    rows = []
    for ii, a in enumerate(ids):
        for b in ids[ii + 1 :]:
            j = jaccard(sets[a], sets[b])
            if j >= threshold:
                rows.append({"a": a, "b": b, "jaccard": j})
    if not rows:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()), "jaccard": pa.array([], type=pa.float64())}
        )
    return pa.Table.from_pylist(rows)


def connected_components(pairs, max_rounds: int = 10):
    """Duplicate clusters from verified near-dup pairs via min-label
    propagation over groupby rounds.

    Scaling note (honest bound): the per-round combine is distributed,
    but the label map itself round-trips through the driver
    (``take_all`` + broadcast), so driver memory is O(nodes appearing in
    pairs) — fine in practice because near-dup pairs touch a small
    fraction of a corpus, but NOT unbounded; a fully distributed variant
    would keep labels as a Dataset and co-shuffle them with the edges.

    ``pairs``: a ray.data.Dataset or pyarrow.Table with int64 columns
    (a, b).  Returns a Dataset of (doc_id, cluster_id) where cluster_id
    is the minimum doc_id of the component.

    Each round: labels join onto the (undirected + self) edge list keyed
    by src, then a ``groupby(dst).min(label)`` — two shuffles of
    O(edges) small rows; rounds needed = graph diameter (near-dup
    components are shallow; max_rounds bounds pathological chains).
    """
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Min

    if not isinstance(pairs, pa.Table):
        tbl = pa.Table.from_pylist(pairs.take_all()) if hasattr(pairs, "take_all") else pa.table(pairs)
    else:
        tbl = pairs
    a = tbl.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
    b = tbl.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    if len(nodes) == 0:
        return rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64()), "cluster_id": pa.array([], type=pa.int64())}))
    src = np.concatenate([a, b, nodes])
    dst = np.concatenate([b, a, nodes])
    edges = rd.from_arrow(pa.table({"src": pa.array(src, type=pa.int64()), "dst": pa.array(dst, type=pa.int64())}))
    labels = {int(x): int(x) for x in nodes}

    for _ in range(max_rounds):
        import ray

        lab_ref = ray.put(labels)

        def relabel(batch: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            keys = np.fromiter(lab.keys(), dtype=np.int64, count=len(lab))
            vals = np.fromiter(lab.values(), dtype=np.int64, count=len(lab))
            order = np.argsort(keys, kind="stable")
            keys, vals = keys[order], vals[order]
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            lv = vals[np.searchsorted(keys, s)]  # all srcs are known nodes
            return pa.table({"dst": pa.array(d, type=pa.int64()), "label": pa.array(lv, type=pa.int64())})

        agg = edges.map_batches(relabel, batch_format="pyarrow").groupby("dst").aggregate(Min("label", alias_name="m"))
        new = {int(r["dst"]): int(r["m"]) for r in agg.take_all()}
        if new == labels:
            break
        labels = new

    out = pa.table(
        {
            "doc_id": pa.array(sorted(labels), type=pa.int64()),
            "cluster_id": pa.array([labels[k] for k in sorted(labels)], type=pa.int64()),
        }
    )
    return rd.from_arrow(out)
